package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ-style constraint
  * verification every ingestion pipeline runs before publishing a
  * table): completeness, distinctness, and rule-violation counts
  * computed in ONE aggregation pass over the table, emitted as tidy
  * (metric, value) rows.
  *
  * Scale shape: a single `agg` with conditional counts — map-side
  * combined, one reduce to a 1-row frame, then a `stack` unpivot of
  * that single row. Distinct counts ride Spark's count(DISTINCT)
  * expand (one extra shuffle keyed on the audited column only).
  * Nothing here is proportional to table width beyond the audited
  * column list; no window, no join, no collect.
  */
object Audit {

  /** A named long-valued audit metric. */
  final case class Rule(name: String, agg: Column)

  /** Standard rules. */
  def rowCount: Rule = Rule("row_count", count(lit(1)))
  def nullCount(c: String): Rule =
    Rule(s"null_count:$c", count(lit(1)) - count(col(c)))
  def distinctCount(c: String): Rule =
    Rule(s"distinct_count:$c", countDistinct(col(c)))
  /** Rows where `pred` holds — use for violation counts
    * (`violations("neg_price", price < 0)`). */
  def violations(name: String, pred: Column): Rule =
    Rule(s"violations:$name", sum(when(pred, 1L).otherwise(0L)))

  /** Run the audit: one row per rule, `ORDER BY metric` left to the
    * caller. All values are BIGINT. Rule names are carried as Column
    * LITERALS, never interpolated into SQL text — a name containing
    * quotes/backslashes/commas round-trips verbatim (Spark would
    * otherwise concatenate adjacent string literals and silently
    * mangle a `''`-escaped quote). */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit: at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      r.agg.cast("long").as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val kvs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("metric"), col(s"__m$i").as("value"))
    }
    one.select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }
}
