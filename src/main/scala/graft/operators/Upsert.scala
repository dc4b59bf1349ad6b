package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert / CDC-merge: apply a change set (inserts, updates,
  * deletes) to a base table — the MERGE INTO semantics every
  * warehouse compaction job needs, expressed as one anti-join plus a
  * union so it runs as a single co-partitioned shuffle pair rather
  * than a full-outer join with row-by-row conditionals.
  *
  * Scale shape: both sides hash-shuffle on the key once (or the
  * change set broadcasts when it's small — the common CDC case, which
  * Catalyst/AQE picks automatically); output is exactly
  * |base − keys(changes)| + |upserts|. No global sort, no windowing
  * over the BASE side — only the (small) change side pays the
  * key-uniqueness guard. Last-writer-wins WITHIN a change set must be
  * resolved by the caller (e.g. max-version row per key) before
  * merging — this operator requires key-unique changes and enforces
  * it with a lazy `assert_true` filter: a duplicate key fails the job
  * rather than silently picking a winner. (The guard is a filter, not
  * a projected column, so column pruning cannot optimize it away.)
  *
  * Reference scope: the reference achieves idempotent re-runs by
  * overwriting whole acquisition files (`main.py:124-131`); row-level
  * merge is part of the warehouse extension suite.
  */
object Upsert {

  /** Plain upsert: rows in `updates` replace base rows with the same
    * key; new keys append. Schemas must match by name. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val guarded = dedupGuard(updates, keys)
    base.join(guarded, keys, "left_anti")
      .unionByName(guarded.select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** CDC merge: `changes` carries `opCol` ∈ {"I", "U", "D"}. I/U rows
    * upsert; D rows delete their key. Unknown op codes fail fast. */
  def merge(base: DataFrame, changes: DataFrame, keys: Seq[String],
            opCol: String = "op"): DataFrame = {
    val keyed = dedupGuard(changes, keys)
      .where(assert_true(col(opCol).isin("I", "U", "D"),
        concat(lit(s"Upsert.merge: bad $opCol code: "), col(opCol))).isNull)
    val upserts = keyed.where(col(opCol) =!= "D")
      .select(base.columns.map(col).toIndexedSeq: _*)
    base.join(keyed, keys, "left_anti").unionByName(upserts)
  }

  /** Fails the job if `df` holds two rows for one key. Costs one
    * window pass over the change side only; its hash partitioning on
    * `keys` is exactly what the downstream merge join needs, so the
    * exchange is reused, not added. */
  private def dedupGuard(df: DataFrame, keys: Seq[String]): DataFrame = {
    val n = count(lit(1)).over(Window.partitionBy(keys.map(col).toIndexedSeq: _*))
    df.withColumn("__n", n)
      .where(assert_true(col("__n") === 1,
        concat(lit("Upsert: duplicate key in change set: "),
          concat_ws("/", keys.map(col).toIndexedSeq: _*))).isNull)
      .drop("__n")
  }
}
