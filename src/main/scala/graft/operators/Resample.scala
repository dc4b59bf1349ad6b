package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-entity event
  * stream onto a fixed-step grid with linear interpolation (gap-fill).
  * The standard prep step before windowed feature extraction on
  * telemetry — the reference's RMS pipeline assumes the decoder's
  * regular sample clock (`main.py:100-102`); this operator produces
  * that regularity for sources that don't have it.
  *
  * Algorithm: per entity, emit grid instants `t = k·step` covering
  * `[min(ts), max(ts)]` (interior only, so every grid point has a
  * neighbor on both sides), union them with the real events into one
  * time-ordered stream, and recover each grid point's bracketing
  * events with two running window functions — `last(value) ignoring
  * nulls` up to the current row and `first(value) ignoring nulls`
  * from it. One shuffle (by entity), no self-join, no per-entity
  * collect: the canonical Spark shape for as-of interpolation, and
  * the window state is O(1) per row.
  *
  * Determinism: events tied on the same (entity, instant) are
  * pre-aggregated with `min(value)` (documented tie-break); grid rows
  * sort after event rows at the same instant, so a grid point landing
  * exactly on an event returns that event's value (the `dt = 0`
  * branch), and the interpolation `v0 + (v1−v0)·(dt/DT)` is evaluated
  * in this exact operation order — all correctly-rounded IEEE ops, so
  * the doubles are bit-identical across engines.
  */
object Resample {

  /** @param events   input frame
    * @param entityCol partition key
    * @param timeCol  long instants (any unit; µs recommended)
    * @param valueCol numeric column to interpolate
    * @param step     grid step, same unit as `timeCol` (> 0)
    * @return (entityCol, grid_ts, v_interp) — one row per interior
    *         grid instant per entity
    */
  def gridInterpolate(events: DataFrame, entityCol: String,
                      timeCol: String, valueCol: String,
                      step: Long): DataFrame = {
    require(step > 0, "gridInterpolate: step must be positive")
    val ent = col(entityCol)
    // Deterministic value per (entity, instant) — pinned LAZILY: the
    // deduped series feeds BOTH the grid-bounds aggregate and the
    // stream union below, and without the checkpoint Catalyst plans
    // two full scans + aggregations of the raw event stream (the plan
    // audit pins the single-scan shape). Lazy (eager=false) because
    // this is pure plan construction with one materialization at the
    // end — the first action (even the orderBy's range-sampling job)
    // computes and persists it once, and every later consumer reuses
    // it; eager would pay one extra scheduled job per call (measured
    // ~0.4 s of q74's wall at sf0.1).
    val ev = events.groupBy(ent, col(timeCol).as("t"))
      .agg(min(col(valueCol).cast("double")).as("v"))
      .localCheckpoint(false)
    // Interior grid: ceil(lo/step)..floor(hi/step). Integer ceil of a
    // non-negative quotient via (lo + step − 1) div step keeps the
    // arithmetic exact for lo ≥ 0 (time axes are epoch-based here).
    // bounds come from the already-deduplicated `ev`, not a second
    // scan of the raw event stream (identical lo/hi, half the input)
    val grid = ev.groupBy(ent)
      .agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
      // Integer `div`, not floor(double /): epoch-µs instants exceed
      // double's 2^53 exact range too easily to round-trip through it.
      .withColumn("s0", expr(s"(lo + ${step - 1}L) div ${step}L"))
      .withColumn("s1", expr(s"hi div ${step}L"))
      .where(col("s0") <= col("s1")) // span shorter than one step → no grid
      .select(ent, explode(sequence(col("s0"), col("s1"))).as("slot"))
      .select(ent, (col("slot") * lit(step)).as("t"),
        lit(null).cast("double").as("v"))
    // Events sort before grid points at the same instant (isg 0 < 1).
    // The bracketing (t, v) pairs ride ONE pre-projected struct per
    // row and ONE window function per direction: `last(tv)` /
    // `first(tv)` over a plain attribute lets Spark place both frames
    // in a single Window operator over the shared sort — the
    // per-component formulation (last(v), last(when(...)), …) forced
    // intermediate projections that split the plan into three Window
    // nodes over the same 280k-row sort (plan-audited now).
    val stream = ev.select(ent, col("t"), col("v"), lit(0).as("isg"))
      .unionByName(grid.withColumn("isg", lit(1)))
      .withColumn("tv", when(col("v").isNotNull,
        struct(col("t").as("bt"), col("v").as("bv"))))
    val ord = Window.partitionBy(ent).orderBy(col("t"), col("isg"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    stream
      .select(ent, col("t"), col("isg"),
        last(col("tv"), ignoreNulls = true).over(back).as("p"),
        first(col("tv"), ignoreNulls = true).over(fwd).as("n"))
      .where(col("isg") === 1)
      .select(ent, col("t").as("grid_ts"),
        when(col("t") === col("p.bt"), col("p.bv"))
          .otherwise(col("p.bv") + (col("n.bv") - col("p.bv")) *
            ((col("t") - col("p.bt")).cast("double") /
              (col("n.bt") - col("p.bt")).cast("double")))
          .as("v_interp"))
  }

  /** Time-weighted average under last-observation-carried-forward —
    * the metric that de-biases irregular sensor/metric series (a
    * plain mean over-weights bursts):
    *
    *   TWA = Σᵢ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first)
    *
    * Cross-engine exact (q98 playbook): values quantize once to
    * integer units (bround ≡ round_even), each vᵢ·Δt term and their
    * sum are exact DECIMAL(38,0) integers, and the only doubles are
    * the final pinned divisions (/duration, /scale — stated in that
    * order by both engines). Entities with a single observation (or
    * zero observed span) have no defined TWA and are dropped.
    * CALLER BOUND for bit-exactness across engines: pick the time
    * unit and `scale` so max|qv|·span < 2⁵³ — then the area's
    * decimal→double cast is exact everywhere; beyond it, engines may
    * legitimately differ in the cast's last ulp (observed: DuckDB's
    * HUGEINT→DOUBLE rounding on a 2⁶⁰-sized area).
    *
    * Scale shape: one hash exchange on the entity, one in-partition
    * window scan (lead) sharing the sort with the aggregation below
    * it — no global window, entity series stay bounded. */
  def timeWeightedAvg(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      valCol: String,
      tieCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(scale >= 1, s"timeWeightedAvg: scale >= 1, got $scale")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    df.select(col(entityCol), col(tsCol), col(tieCol),
        bround(col(valCol) * lit(scale.toDouble), 0)
          .cast("decimal(38,0)").as("_qv"))
      .withColumn("_dt",
        (lead(col(tsCol), 1).over(w) - col(tsCol)).cast("decimal(38,0)"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("_dt").isNotNull, col("_qv") * col("_dt"))).as("_area"),
        (max(col(tsCol)) - min(col(tsCol))).as("span"))
      .where(col("span") > 0)
      .select(col(entityCol), col("n_obs"), col("span"),
        (col("_area").cast("double") / col("span").cast("double")
          / lit(scale.toDouble)).as("twa"))
  }
}
