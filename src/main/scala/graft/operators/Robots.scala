package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt crawl-policy evaluation (RFC 9309) — the compliance
  * gate a web-corpus pipeline applies between URL discovery and
  * fetching/retention. Spark-first shape: the per-host policy files
  * parse into a RULES table that is broadcast-joined to the URL
  * table on host (policies are dimension-sized next to a crawl
  * frontier), the path match runs as a codegen `regexp_like` filter,
  * and the RFC's longest-match / allow-wins-ties decision folds into
  * ONE integer aggregate: score = 2·patternOctets + isAllow, take
  * max — higher octet count dominates, and at equal length the
  * allow rule scores one higher, which is exactly §2.4.3's "least
  * restrictive" tie rule. No matching rule (or no robots.txt at
  * all) → allowed.
  *
  * Group selection per the RFC: the group(s) whose user-agent line
  * equals the crawler's product token (case-insensitive) win; absent
  * that, the `*` groups; rules of all selected groups combine.
  * Patterns support `*` (any substring) and a trailing `$` (end
  * anchor); empty patterns are no-ops; unknown directives
  * (crawl-delay, sitemap) and comments are ignored.
  */
object Robots {

  private[graft] final case class Rule(pattern: String, allow: Boolean)

  /** Parse one robots.txt and return the rules of the group(s)
    * selected for `agent` (exact token match, else the `*` groups). */
  private[graft] def parse(txt: String, agent: String): Seq[Rule] = {
    if (txt == null) return Nil
    val a = agent.toLowerCase
    // group = (user-agent tokens, rules); a UA line AFTER rules
    // starts a new group
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.Set[String],
        scala.collection.mutable.ArrayBuffer[Rule])]
    var curUas = scala.collection.mutable.Set.empty[String]
    var curRules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var inUaRun = false
    def flush(): Unit = {
      if (curUas.nonEmpty) groups += ((curUas, curRules))
      curUas = scala.collection.mutable.Set.empty[String]
      curRules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    }
    txt.split("\r?\n", -1).foreach { rawLine =>
      val noComment = {
        val h = rawLine.indexOf('#')
        if (h >= 0) rawLine.substring(0, h) else rawLine
      }
      val line = noComment.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inUaRun) flush()
            inUaRun = true
            if (value.nonEmpty) curUas += value.toLowerCase
          case "allow" =>
            inUaRun = false
            if (value.nonEmpty) curRules += Rule(value, allow = true)
          case "disallow" =>
            inUaRun = false
            if (value.nonEmpty) curRules += Rule(value, allow = false)
          case _ => inUaRun = false // crawl-delay, sitemap, …: ignored
        }
      }
    }
    flush()
    val exact = groups.filter(_._1.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2).toSeq
  }

  /** RFC pattern → Java regex: literal chunks quoted, `*` → `.*`,
    * one trailing `$` → end anchor; anchored at the path start
    * (prefix semantics otherwise). */
  private[graft] def toRegex(pattern: String): String = {
    val (body, anchor) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), "$") else (pattern, "")
    val quoted = body.split("\\*", -1)
      .map(ch => if (ch.isEmpty) "" else java.util.regex.Pattern.quote(ch))
      .mkString(".*")
    "^" + quoted + anchor
  }

  /** Pattern specificity in octets — the RFC's longest-match metric
    * (includes `*` and `$` characters). */
  private[graft] def patternLen(p: String): Int = p.getBytes("UTF-8").length

  /** Evaluate the crawl policy for every (host, path) URL against a
    * per-host robots.txt table. Output: host, path, allowed. */
  def robotsFilter(
      urls: DataFrame, robots: DataFrame, agent: String): DataFrame = {
    val spark = urls.sparkSession
    val ruleSchema = StructType(Seq(
      StructField("host", StringType, false),
      StructField("re", StringType, false),
      StructField("plen", IntegerType, false),
      StructField("is_allow", IntegerType, false)))
    val ruleRows = robots.select(col("host"), col("robots_txt")).rdd
      .mapPartitions(_.flatMap { r =>
        parse(r.getString(1), agent).map(rule =>
          Row(r.getString(0), toRegex(rule.pattern),
            patternLen(rule.pattern), if (rule.allow) 1 else 0))
      })
    val rules = spark.createDataFrame(ruleRows, ruleSchema)
    // rules are dimension-sized next to a crawl frontier → broadcast;
    // the regexp match is a codegen filter on the joined rows
    urls.select(col("host"), col("path"))
      .join(broadcast(rules), Seq("host"), "left")
      .withColumn("score",
        when(col("re").isNotNull && regexp_like(col("path"), col("re")),
          col("plen") * 2 + col("is_allow")))
      .groupBy(col("host"), col("path"))
      .agg(max(col("score")).as("best"))
      // no matching rule → allowed; else parity of the max score
      // (allow scores odd) IS the longest-match decision
      .withColumn("allowed",
        col("best").isNull || col("best") % 2 === 1)
      .select(col("host"), col("path"), col("allowed"))
  }
}
