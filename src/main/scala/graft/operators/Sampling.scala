package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified / weighted corpus sampling — the
  * data-mixing primitive of training-data pipelines ("keep 50% of
  * crawl, 10% of forums, all of wiki"). A pure Column filter:
  *
  *  - no shuffle, no RNG state — the keep decision is a function of
  *    (id, seed, stratum) only, so the sample is reproducible across
  *    runs, partitionings, and engines, and rows keep their sampling
  *    fate when the corpus is re-sharded or incrementally extended
  *    (the property `df.sample()` does NOT have);
  *  - the hash is Knuth's multiplicative golden-ratio scheme computed
  *    in exact 128-bit DECIMAL arithmetic, so any engine (Spark,
  *    DuckDB HUGEINT, …) derives the identical keep set — unlike
  *    xxhash64, which only Spark evaluates;
  *  - per-stratum rates become integer thresholds on the hash value
  *    (keep iff u < ⌊rate·2⁶⁴⌋), folded into one CASE expression —
  *    codegen'd, scale-free.
  */
object Sampling {

  private val Phi = new JBigDecimal("11400714819323198485") // ⌊2⁶⁴/φ⌋, odd
  private val Two64 = new JBigDecimal("18446744073709551616")
  private val Two32 = new JBigDecimal("4294967296")
  private val PhiHi = new JBigDecimal("2654435769")  // Phi div 2³²
  private val PhiLo = new JBigDecimal("2135587861")  // Phi mod 2³²

  /** u(id) = ((id + seed) mod 2⁶⁴)·⌊2⁶⁴/φ⌋ mod 2⁶⁴ as DECIMAL(38,0),
    * uniform over [0, 2⁶⁴) for sequential AND hashed ids anywhere in
    * the signed-long range. Two sign/overflow traps are designed out:
    * decimal `%` follows the dividend's sign (a negative hash would
    * compare below every threshold ⇒ row always kept), so the input
    * is first range-reduced to [0, 2⁶⁴); and a 20-digit a times
    * 20-digit Phi can exceed DECIMAL(38)'s range (ANSI exception), so
    * the product is taken schoolbook-style in 2³² halves — every
    * intermediate stays < 10²⁹. Identical values to the plain
    * (a·Phi) mod 2⁶⁴ on any input. */
  def uniformHash64(id: Column, seed: Long): Column = {
    val raw = (id.cast("decimal(38,0)") + lit(seed)) % lit(Two64)
    val a = when(raw < 0, raw + lit(Two64)).otherwise(raw)
    // (a·Phi) mod 2⁶⁴ = (a·PhiLo + ((a·PhiHi) mod 2³²)·2³²) mod 2⁶⁴
    (a * lit(PhiLo) + (a * lit(PhiHi) % lit(Two32)) * lit(Two32)) % lit(Two64)
  }

  /** ⌊rate · 2⁶⁴⌋ — the exact integer keep-threshold for a rate. */
  def threshold(rate: BigDecimal): JBigDecimal =
    Two64.multiply(rate.underlying).setScale(0, RoundingMode.FLOOR)

  /** Keep each row of stratum s with probability rates(s) —
    * deterministically in (idCol, seed). Strata absent from `rates`
    * keep `defaultRate`. Rates are exact decimals (pass
    * BigDecimal("0.1"), not 0.1) so engine and oracle agree on the
    * threshold integer. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, BigDecimal],
      defaultRate: BigDecimal = BigDecimal(0),
      seed: Long = 0L): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1) &&
      defaultRate >= 0 && defaultRate <= 1, "rates must be in [0, 1]")
    val thrCol = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(threshold(rate))).otherwise(acc)
    }
    df.where(uniformHash64(col(idCol), seed) < thrCol)
  }

  /** EXACTLY `k` rows per stratum (all rows where the stratum has
    * fewer): the k smallest (u(id), id) — the fixed-budget mixing
    * primitive ("5 000 docs per source into the eval slice") next to
    * [[stratifiedSample]]'s fixed-rate one. Same exact-decimal hash ⇒
    * same cross-engine determinism, and the selection is a PREFIX of
    * the hash order, so growing the corpus only ever swaps rows out,
    * never reshuffles survivors arbitrarily. One stratum-keyed
    * shuffle; rank is a streaming row_number over the in-partition
    * sort (skew-heavy strata sort spill-aware — for k ≪ stratum size
    * a rate pre-filter via [[stratifiedSample]] can bound the sort
    * input first). */
  def stratifiedExactK(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      k: Int,
      seed: Long = 0L): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(uniformHash64(col(idCol), seed), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Temperature-flattened mixture sampling — the source/language
    * REBALANCING step of multilingual and multi-source training
    * mixes (α = 0.5 temperature: sampling proportional to √c instead
    * of c up-weights rare strata, down-weights dominant ones —
    * the standard fix for head-language domination). Per stratum of
    * c rows keep k = min(c, scale · ⌊√c⌋) rows: the budget uses
    * INTEGER sqrt (⌊·⌋ of an IEEE sqrt on counts < 2⁵², exact in any
    * engine), selection is [[stratifiedExactK]]'s k-smallest
    * (hash, id) prefix — so the whole operator is engine-exact and
    * corpus-growth-stable.
    *
    * Fully lazy, no driver collect: the per-stratum budgets are one
    * map-side-combined count aggregate (rows = distinct strata)
    * broadcast back onto the row stream; the only corpus-sized
    * exchange is the stratum-keyed rank shuffle it shares with
    * [[stratifiedExactK]]. */
  def temperatureFlatten(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      scale: Long = 1L,
      seed: Long = 0L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val ks = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__c"))
      .select(col(stratumCol),
        least(col("__c"),
          lit(scale) * floor(sqrt(col("__c").cast("double"))).cast("long"))
          .as("__k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(uniformHash64(col(idCol), seed), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(ks), Seq(stratumCol))
      .where(col("__rn") <= col("__k"))
      .select(df.columns.map(col).toSeq: _*) // input column order
  }

  /** Proportional mixture interleaving — the deterministic TRAINING
    * ORDER for a multi-source corpus: stratum s appears in the
    * schedule with frequency ∝ weights(s), uniformly interleaved
    * rather than in blocks (block order front-loads one distribution;
    * interleaving keeps every training prefix on-mixture — the
    * sampling-schedule half of Pile/Dolma-style data mixing).
    *
    * Mechanism: rows rank within their stratum by the deterministic
    * (uniformHash64, id) order; row rn of stratum s gets
    * `sched_key = rn · (L / weights(s))` with L = lcm(weights) — an
    * exact integer rational ordering (rn / w without division), so a
    * weight-2 stratum lands keys at half the stride of a weight-1
    * stratum. Consumers sort by (sched_key, stratum, id) — a total
    * SORT (range exchange), not a global window, so the schedule
    * scales like any distributed sort. Strata absent from `weights`
    * are dropped (weight 0).
    */
  def mixtureSchedule(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Long],
      seed: Long = 0L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixtureSchedule: weights must be positive")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val L = weights.values.foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val strides = weights.toSeq.sortBy(_._1)
    val stride = strides.tail
      .foldLeft(when(col(stratumCol) === strides.head._1,
        lit(L / strides.head._2))) { case (acc, (s, wgt)) =>
        acc.when(col(stratumCol) === s, lit(L / wgt))
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(uniformHash64(col(idCol), seed), col(idCol))
    df.withColumn("__stride", stride)
      .where(col("__stride").isNotNull)
      .withColumn("sched_key",
        row_number().over(w).cast("long") * col("__stride"))
      .drop("__stride")
  }

  /** Weight-proportional SYSTEMATIC sampling (size-proportional-to-
    * weight without replacement): lay rows end-to-end in id order,
    * each occupying `weight` units of the cumulative axis, and select
    * the row under every multiple of step = ⌊W/k⌋ (W = total weight).
    * The classic PPS-systematic design — inclusion probability is
    * proportional to weight, a row with weight ≥ step is ALWAYS
    * selected (`hits` counts how many grid points it absorbs, like
    * PPS with-replacement multiplicity), and the draw is fully
    * deterministic in (id order, weights, k): no RNG, so engine and
    * oracle derive the identical sample, and the selection is stable
    * under re-sharding.
    *
    * Built on [[Packing.sequencePack]]'s distributed prefix sum (the
    * one corpus-sized exchange is its range partition; the grid
    * selection itself is a pure Column filter over nonneg integers —
    * truncating and flooring division agree, so `div` ≡ DuckDB `//`).
    * Driver traffic: the 1-row total-weight aggregate + sequencePack's
    * per-partition subtotals. Preconditions inherited: unique ids,
    * non-null weights; weights must be ≥ 0 and W ≥ k. */
  def weightedSystematic(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"weightedSystematic: k >= 1, got $k")
    val totRow = df.agg(
      sum(col(weightCol).cast("long")).as("w"),
      min(col(weightCol).cast("long")).as("mn")).head()
    require(!totRow.isNullAt(0), "weightedSystematic: empty input")
    require(totRow.getLong(1) >= 0,
      s"weightedSystematic: negative weight ${totRow.getLong(1)}")
    val total = totRow.getLong(0)
    require(total >= k.toLong,
      s"weightedSystematic: total weight $total < k=$k")
    val step = total / k
    // zero-weight rows occupy no axis (they cannot absorb a grid
    // point, and dropping them leaves every other row's offset
    // unchanged) — excluding them up front keeps all grid arithmetic
    // on strictly positive intervals, where truncating division is
    // flooring division in every engine
    Packing.sequencePack(
        df.where(col(weightCol).cast("long") >= 1L)
          .select(col(idCol), col(weightCol)),
        idCol, weightCol, budget = step)
      .select(col("id"), col("n_tokens").as("weight"),
        col("start_tok").as("cum_start"))
      // grid points m·step inside [cum_start, cum_start+weight):
      // first = ceil(cum_start/step), last = (cum_start+weight-1) div step
      .withColumn("_first", expr(s"(cum_start + ${step - 1}L) div ${step}L"))
      .withColumn("hits",
        expr(s"(cum_start + weight - 1L) div ${step}L") - col("_first") + 1L)
      .where(col("hits") >= 1L)
      .withColumnRenamed("_first", "first_grid")
  }
}
