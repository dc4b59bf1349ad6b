package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional skyline (Pareto frontier): rows not DOMINATED by
  * any other row, where q dominates p iff q is ≤ p on the minimized
  * dimension, ≥ p on the maximized dimension, and strictly better on
  * at least one. Börzsönyi et al. (ICDE 2001) semantics; ties on both
  * dimensions survive together (neither dominates).
  *
  * The 2-D case needs no pairwise comparison at all — the sort-based
  * characterization is exact:
  *
  *   p is on the skyline  ⟺  maxCol(p) > max{ maxCol(q) : minCol(q) < minCol(p) }
  *                           AND maxCol(p) = max{ maxCol(q) : minCol(q) = minCol(p) }
  *
  * so the plan is: per-cost-group max (one hash aggregate over the
  * DISTINCT minimized values — tiny), a running strict-prefix max
  * over that deduplicated series (a window over group rows, not data
  * rows), and a broadcast-joinable filter back onto the data. The
  * naive O(n²) dominance anti-join never appears; the only data-sized
  * exchanges are the groupBy and the final join. Both dimensions must
  * be integers (callers quantize doubles first — q98 playbook), so
  * every comparison is exact cross-engine. */
object Skyline {

  def skyline2d(
      df: DataFrame,
      minimizeCol: String,
      maximizeCol: String): DataFrame = {
    val groups = df.groupBy(col(minimizeCol).as("_c"))
      .agg(max(col(maximizeCol)).as("_gmax"))
    val wPrefix = Window.orderBy(col("_c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // window over DISTINCT minimized values only — bounded, not
    // data-sized; single-partition by construction of the frame, which
    // is fine because |distinct costs| ≪ |rows| (and inherent: the
    // prefix max is a serial recurrence over that series)
    val frontierGroups = groups
      .withColumn("_pmax", max(col("_gmax")).over(wPrefix))
      .where(col("_pmax").isNull || col("_gmax") > col("_pmax"))
      .select(col("_c"), col("_gmax"))
    df.join(frontierGroups,
        col(minimizeCol) === col("_c") && col(maximizeCol) === col("_gmax"))
      .drop("_c", "_gmax")
  }
}
