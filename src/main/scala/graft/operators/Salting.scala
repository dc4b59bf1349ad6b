package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew salting for equi-joins (SURVEY.md §4.2 / the 100 TB
  * posture). AQE's skew-join split handles most cases at runtime;
  * this operator is for the pathological ones AQE can't touch —
  * a single key holding a double-digit percentage of the big side,
  * or a skewed key feeding a non-splittable downstream stage.
  *
  * Mechanics: the big side gets a deterministic per-row salt in
  * [0, factor); the small side is replicated `factor` times; the join
  * key becomes (key, salt), spreading one hot key over `factor`
  * reducers. Row-count preserving: every big-side row matches exactly
  * the one replica carrying its salt. The salt derives from
  * xxhash64 of the whole row (not rand()) so re-runs are stable.
  */
object Salting {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      factor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    // right/full outer would emit null-extended rows for unmatched
    // REPLICAS (up to factor-1 spurious rows per small-side row)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedEquiJoin supports inner/left-flavored joins, got $joinType")
    val bigCols = big.columns
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigCols.map(col): _*), lit(factor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
