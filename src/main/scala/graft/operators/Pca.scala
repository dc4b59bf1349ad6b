package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA leading component via EXACT INTEGER power
  * iteration — the embedding-analysis primitive ("what single
  * direction explains this corpus", drift detection, whitening prep)
  * built so that every engine derives the identical result:
  *
  *  1. vectors quantize once to integer units (bround ≡ round_even —
  *     q98 playbook);
  *  2. ONE distributed aggregation pass builds the d² scatter sums
  *     Σqᵢqⱼ and the d means-side sums Σqᵢ (pair explosion → partial-
  *     aggregated groupBy — n·d² rows through map-side combine, no
  *     driver data traffic beyond the d²-cell matrix);
  *  3. the UNNORMALIZED covariance C = n·Σqq' − (Σq)(Σq)' is exact
  *     128-bit integer cell-wise; the d×d matrix (64² cells ≈ KBs)
  *     power-iterates ON THE DRIVER in BigInt — k·d² work, the
  *     legitimate bounded driver step — with a deterministic integer
  *     renormalization each round: v ← sign(w)·(|w|·10⁶ div max|w|)
  *     (sign-split so truncating and flooring division agree on the
  *     negative entries in every engine);
  *  4. each vector's projection score q·v broadcasts back as a
  *     literal-vector dot product — pure long arithmetic, shuffle-
  *     free.
  *
  * The output is DEFINED as "`iters` power steps from e₁ under this
  * arithmetic" — deterministic regardless of the spectrum (no
  * convergence/eigengap caveats in the contract), and the direction's
  * sign is pinned by the e₁ start. */
object Pca {

  /** (id, score): each vector's integer projection onto the iterated
    * leading direction (direction entries in 10⁶ units, scores in
    * quantization·10⁶ units). Requires every vector non-null with the
    * same dimension d ≤ 256. */
  def powerProjection(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int = 4,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 16,
      s"powerProjection: iters in [1, 16], got $iters")
    val q = df.select(col(idCol).as("id"),
        transform(col(vecCol),
          e => bround(e.cast("double") * lit(scale.toDouble), 0)
            .cast("long")).as("qv"))
      .localCheckpoint(eager = true) // feeds moments AND projection
    val dims = q.select(size(col("qv")).as("d")).agg(
      min(col("d")), max(col("d")), count(lit(1))).head()
    val d = dims.getInt(0)
    require(d == dims.getInt(1), s"powerProjection: ragged dims " +
      s"${dims.getInt(0)}..${dims.getInt(1)}")
    require(d >= 1 && d <= 256, s"powerProjection: d in [1,256], got $d")
    val n = dims.getLong(2)
    // one exploded pass → d² scatter cells + d linear sums
    val u = q.select(col("id"), posexplode(col("qv")).as(Seq("i", "x")))
      .localCheckpoint(eager = true)
    val sij = u.as("a").join(u.as("b"), col("a.id") === col("b.id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum((col("a.x") * col("b.x")).cast("decimal(38,0)")).as("s"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        BigInt(r.getDecimal(2).toBigInteger))).toMap
    val si = u.groupBy(col("i"))
      .agg(sum(col("x").cast("decimal(38,0)")).as("s"))
      .collect().map(r => (r.getInt(0),
        BigInt(r.getDecimal(1).toBigInteger))).toMap
    val bn = BigInt(n)
    val c = Array.tabulate(d, d)((i, j) =>
      bn * sij((i, j)) - si(i) * si(j))
    // driver power iteration with sign-split integer renormalization
    var v = Array.tabulate(d)(i => if (i == 0) BigInt(1000000) else BigInt(0))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      require(m > 0, "powerProjection: zero covariance matrix")
      v = w.map(x => x.sign * ((x.abs * 1000000) / m))
    }
    // broadcast-literal projection: Σ qv_k · v_k in plain long math
    // (|qv|·|v| ≤ scale·10⁶ per term — callers keep d·scale·10⁶ < 2⁶³)
    val vLit = array(v.map(x => lit(x.toLong)): _*)
    q.select(col("id"),
      aggregate(zip_with(col("qv"), vLit, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t).as("score"))
  }
}
