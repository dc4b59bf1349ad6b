package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares — the per-entity trend fit of a
  * feature pipeline ("is this user's metric drifting?"), computed as
  * a SINGLE aggregation pass from the five sufficient statistics
  * (n, Σx, Σy, Σx², Σxy). No iterative solver, no per-group
  * collection: one hash exchange on the key, map-side partials, and
  * the slope/intercept come out of closed-form arithmetic.
  *
  * Cross-engine exactness (the q98 playbook): y is quantized once to
  * integer units (bround ≡ round_even), x must already be a SMALL
  * integer (callers re-center to an offset — e.g. days since the
  * group's first observation), so every sufficient statistic is an
  * exact DECIMAL(38,0) integer; the slope's numerator/denominator
  * (n·Σxy − Σx·Σy, n·Σx² − Σx²) stay within 2⁵³, so the final
  * cast-to-double + ONE division is the identical IEEE operation in
  * any engine.
  */
object Regression {

  /** Per-key OLS of quantized y against integer x. Output: key, n,
    * slope and intercept (doubles from one pinned division each;
    * intercept is at x = 0, i.e. the caller's re-centered origin).
    * Groups whose x never varies (denominator 0) are dropped — a
    * vertical "trend" has no OLS fit. yScale = quantization units per
    * 1.0 of y. */
  def groupedOls(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String,
      yScale: Long = 1000000L): DataFrame = {
    require(yScale >= 1, s"groupedOls: yScale >= 1, got $yScale")
    val q = df.select(col(keyCol).as("k"),
      col(xCol).cast("decimal(38,0)").as("x"),
      bround(col(yCol) * lit(yScale.toDouble), 0)
        .cast("decimal(38,0)").as("y"))
    q.groupBy("k")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .where(col("den") =!= lit(0))
      // slope in y-units per x-unit, de-quantized by the SAME literal
      // scale both engines state; intercept = (Σy − b·Σx)/n derived
      // from the already-final slope double (identical op order)
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / col("den").cast("double") / lit(yScale.toDouble))
      .withColumn("intercept",
        (col("sy").cast("double") / lit(yScale.toDouble)
          - col("slope") * col("sx").cast("double"))
          / col("n").cast("double"))
      .select(col("k"), col("n").cast("long").as("n"),
        col("slope"), col("intercept"))
  }

  /** Integer-exact z-score outlier flagging: rows whose value lies
    * more than `k` population standard deviations from their group's
    * mean. The usual formulation compares doubles against a sqrt —
    * un-gateable across engines. Cross-multiplying removes both the
    * division and the sqrt:
    *
    *   |x − μ| > k·σ  ⟺  (n·x − S)² > k²·(n·Σx² − S²)
    *
    * (μ = S/n, σ² = (n·Σx² − S²)/n²) — every side an exact
    * DECIMAL(38,0) integer after the one-time y quantization, so the
    * flag decision is bit-identical in any engine. One aggregation +
    * one broadcast-joinable stats frame; the flag itself is a pure
    * Column predicate. */
  def zScoreOutliers(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      k: Int,
      yScale: Long = 1000000L): DataFrame = {
    require(k >= 1 && k <= 100, s"zScoreOutliers: k in [1,100], got $k")
    val q = df.withColumn("_q",
      bround(col(valCol) * lit(yScale.toDouble), 0).cast("decimal(38,0)"))
    val stats = q.groupBy(col(keyCol).as("_sk"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_q")).as("_s"),
        sum(col("_q") * col("_q")).as("_ss"))
    q.join(stats, col(keyCol) === col("_sk"))
      .where({
        val dev = col("_n") * col("_q") - col("_s")
        val varTerm = col("_n") * col("_ss") - col("_s") * col("_s")
        dev * dev > lit(k.toLong * k.toLong) * varTerm
      })
      .drop("_sk", "_q")
      .withColumnRenamed("_n", "group_n")
      .withColumn("group_n", col("group_n").cast("long"))
      .drop("_s", "_ss")
  }
}
