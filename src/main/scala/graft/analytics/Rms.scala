package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Tumbling-window RMS with window-completeness gating — the
  * reference's second derived table (EP3, `main.py:146-181`),
  * generalized over window length / threshold / axis set.
  *
  * The reference runs two groupbys plus an `isin` semi-join (span
  * check → bucket list → detail filter → RMS agg). Because each
  * window's RMS depends only on that window's rows, filter-after-agg
  * is semantically identical, so this authors the fused plan directly
  * (SURVEY.md §4.1): ONE hash aggregate computing count/min/max/avg(x²)
  * per bucket, then a post-aggregation filter and a narrow projection.
  * One shuffle total at any scale; partial (map-side) aggregation
  * reduces 26 667 rows/s/device to one partial row per task before the
  * exchange.
  */
object Rms {

  /** @param df           enriched frame: `timeCol` epoch-ns long + axis doubles
    * @param axes         axis column names (e.g. A_x_g, A_y_g, A_z_g)
    * @param windowNs     tumbling window length (reference: 1 s)
    * @param completeness min observed span as a fraction of the window
    *                     (reference: 0.999, `main.py:151`)
    * @param alias        constant alias column value (`main.py:180`)
    * @param timeCol      epoch-ns time column name
    * @param maxAbs       caller-declared bound on |axis value| (sensor
    *                     physics: max raw code × sensitivity). When
    *                     present and ≤ ~30, enables the long-sum fast
    *                     path (see below); None keeps the decimal
    *                     aggregation unchanged.
    *
    * Output schema mirrors the reference (`FIXTURES.md §1.4`):
    * `rms_<axis suffix>…, rms_mod, Time (window start, epoch ns), alias`.
    */
  def compute(
      df: DataFrame,
      axes: Seq[String],
      windowNs: Long = 1000000000L,
      completeness: Double = 0.999,
      alias: String = "unknown",
      timeCol: String = "Time",
      maxAbs: Option[Double] = None): DataFrame = {

    // integer `div`, NOT `/`: double division of epoch-ns longs loses
    // precision (ulp at 2025 magnitudes is 256 ns), putting boundary
    // samples in the wrong window
    val bucket = expr(s"CAST(`$timeCol` AS BIGINT) div ${windowNs}L")
      .as("bucket")
    // pandas `mean` skips NaN; Spark `avg` skips null — align by
    // nulling NaNs before the aggregate (SURVEY.md §7.4). The sum of
    // squares goes through DECIMAL(30,8) so it is exact and shuffle-
    // order independent (the q02/q08 dsum pattern — scale 8 keeps the
    // scaled value < 2^53, where both engines' double→decimal casts
    // agree bit-exactly; the ≤5e-9 per-sample quantization moves RMS
    // by ≲1e-8 relative, inside every physical tolerance); the square
    // is `v*v` (correctly-rounded IEEE multiply, bit-identical in
    // every engine) rather than pow(), whose libm rounding may differ.
    def sq(c: String): Column = {
      val v = nanvl(col(c), lit(null))
      v * v
    }
    // LONG-SUM fast path (round 11): when the caller bounds |v| —
    // sensor physics gives max raw code × sensitivity — the quantized
    // sum is computed as a plain long sum of the EXACT per-row
    // unscaled quantizations (graft.functions.Quantize8: bit-identical
    // to the decimal cast's value), re-materialized as one
    // DECIMAL(38,8) per OUTPUT row via MakeDecimal. Value-identical:
    // Σ of scale-8 decimals IS the integer Σ uᵢ either way, and the
    // final decimal→double conversion is the same correctly-rounded
    // BigDecimal.doubleValue. Overflow headroom: the |v| ≤ 30.3 gate
    // (a² ≤ 921 ⇒ uᵢ ≤ 9.3e10) leaves room for 10⁸ samples per
    // window — 1 h at 26.7 kHz — and past it the ANSI long sum raises
    // loudly rather than wrapping. Why: decimal casts + decimal
    // hash-agg buffers cost ~12× a codegen'd long sum (measured 4.4 s
    // vs 0.35 s over the 16M-row ingest fixture) — the largest
    // non-I/O cost of the ingest path.
    val useLong = maxAbs.exists(a => !a.isNaN && a * a <= 921.0)
    def ssq(a: String): Column =
      if (useLong)
        org.apache.spark.sql.graftshim.ColumnShim.column(
          org.apache.spark.sql.catalyst.expressions.MakeDecimal(
            org.apache.spark.sql.graftshim.ColumnShim.expression(
              sum(graft.functions.Quantize8(sq(a)))),
            38, 8, nullOnOverflow = false)).cast("double")
      else sum(sq(a).cast("decimal(30,8)")).cast("double")
    val aggs: Seq[Column] =
      axes.flatMap(a => Seq(
        ssq(a).as(s"__ssq_$a"),
        count(nanvl(col(a), lit(null))).as(s"__cnt_$a"))) ++ Seq(
        min(col(timeCol)).as("__tmin"),
        max(col(timeCol)).as("__tmax"))

    val rmsNames = axes.map(rmsName)
    val rmsCols = axes.zip(rmsNames).map { case (a, n) =>
      sqrt(col(s"__ssq_$a") / col(s"__cnt_$a").cast("double")).as(n)
    }
    df.groupBy(bucket)
      .agg(aggs.head, aggs.tail: _*)
      // window-completeness HAVING (reference `main.py:148-153`)
      .where(col("__tmax") - col("__tmin") >= lit((completeness * windowNs).toLong))
      .select(rmsCols :+ (col("bucket") * lit(windowNs)).as(timeCol): _*)
      // row-wise vector magnitude (reference `main.py:175`); v*v not
      // pow() for cross-engine bit-identity
      .withColumn("rms_mod", sqrt(rmsNames.map(n => col(n) * col(n)).reduce(_ + _)))
      .withColumn("alias", lit(alias))
      .select(rmsNames.map(col) ++ Seq(col("rms_mod"), col(timeCol), col("alias")): _*)
  }

  /** `A_x_g` → `rms_x` (reference names `main.py:162-172`); fallback
    * keeps the sanitized axis name. */
  private[analytics] def rmsName(axis: String): String = {
    val m = "^[A-Za-z]+_([A-Za-z0-9]+)_[A-Za-z]+$".r
    axis match {
      case m(core) => s"rms_$core"
      case _ => s"rms_$axis"
    }
  }
}
