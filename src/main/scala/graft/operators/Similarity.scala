package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Random

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (SURVEY.md §7.1 ext):
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *    baseline. One broadcast of the smaller side, per-partition
  *    ranking, no all-pairs shuffle.
  *  - [[lshTopK]]: random-hyperplane LSH (sign-of-projection
  *    sketches, Charikar'02) — the 100 TB path. Candidates come from
  *    bucket equi-joins (`tables` independent hash tables of
  *    `bits`-bit signatures), then exact cosine ranks only the
  *    candidates. Recall tunes with tables×bits.
  *
  * Cosine is computed in double via codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDFs.
  */
// Serializable: the PQ kernels (pqEncode/adcLutFlat) are object methods
// called from task closures, which therefore capture the (stateless)
// module reference
object Similarity extends Serializable {

  /** Native codegen dot product ([[graft.functions.DotProduct]]) —
    * sequential left-to-right double sum (the same evaluation order
    * DuckDB's list kernels use, so cross-engine ranks are stable),
    * without the per-row array allocation of the zip_with/aggregate
    * higher-order formulation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Exact top-k neighbors for every row of `queries` against
    * `corpus` (both `(idCol, vecCol)`), excluding self-matches.
    * Output: (q, rank, n, cos).
    *
    * Scale shape: the corpus is broadcast (blocks stream through
    * query partitions — no shuffle on the N×M candidate space), and
    * the top-k runs as a typed `Aggregator` with map-side partial
    * aggregation, so each task emits at most k rows per query key
    * before the exchange — the N×M pair stream never shuffles. For
    * corpus ≫ broadcast memory use [[ivfTopK]]. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxBroadcastBytes: Long = 2L << 30): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // fail fast instead of letting a giant broadcast OOM an executor:
    // the optimizer's size estimate is file-stat-accurate for file
    // sources and exact for local relations. Stats-less plans
    // (LogicalRDD, some DSv2 scans) report spark.sql.defaultSizeInBytes
    // = Long.MaxValue — that means UNKNOWN, not huge, so only enforce
    // when the estimate is a real number.
    val est = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    require(est >= BigInt(Long.MaxValue) || est <= maxBroadcastBytes,
      s"bruteForceTopK would broadcast ~$est bytes of corpus (limit " +
        s"$maxBroadcastBytes); use ivfTopK or lshTopK for large corpora")
    val q = queries.select(col(idCol).cast(LongType).as("q"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).cast(LongType).as("n"),
      col(vecCol).cast("array<double>").as("nv"))
      .withColumn("nn", norm(col("nv")))
    val scored = q.join(broadcast(c), col("q") =!= col("n"))
      .select(col("q"), col("n"),
        cosine(col("qv"), col("nv"), col("qn"), col("nn")).as("cos"))
      .as[(Long, Long, Double)]
    val topk = graft.functions.TopKAggregator.TopK(k).toColumn
    scored.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.name("topk"))
      .toDF("q", "topk")
      .select(col("q"), posexplode(col("topk")))
      .select(col("q"), (col("pos") + 1).as("rank"),
        col("col._1").as("n"), col("col._2").as("cos"))
  }

  /** Deterministic Gaussian hyperplanes: tables × bits × dim. */
  private def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long)
      : Array[Array[Array[Double]]] = {
    val rnd = new Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** (id, table, bucket) signature rows. Sign-of-projection sketches
    * are per-row imperative math over a dense vector — mapPartitions
    * (SURVEY.md §7.1: genuine per-partition numeric kernel; an
    * expression tree of tables×bits×dim terms would defeat codegen). */
  def buckets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int = 8,
      bits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val head = df.select(size(col(vecCol))).head(1)
    if (head.isEmpty) // empty corpus → empty buckets, not a crash
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("id", LongType, false),
          StructField("table", IntegerType, false),
          StructField("bucket", LongType, false))))
    val dim = head.head.getInt(0)
    val planes = spark.sparkContext.broadcast(hyperplanes(tables, bits, dim, seed))
    val in = df.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val out = in.rdd.mapPartitions { it =>
      val pl = planes.value
      it.flatMap { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Double](1).toArray
        pl.indices.iterator.map { t =>
          var bucket = 0L
          var j = 0
          while (j < pl(t).length) {
            var s = 0.0
            val plane = pl(t)(j)
            var d = 0
            while (d < v.length && d < plane.length) { s += v(d) * plane(d); d += 1 }
            if (s >= 0) bucket |= (1L << j)
            j += 1
          }
          Row(id, t, bucket)
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, false),
      StructField("table", IntegerType, false),
      StructField("bucket", LongType, false))))
  }

  /** Deterministic sampled k-means (k-means++ init, fixed iteration
    * count, sequential arithmetic) — the IVF coarse quantizer. Runs
    * on a driver-side sample (the standard production approach:
    * train the quantizer on a sample, broadcast the centroids). */
  private[operators] def trainCentroids(
      sample: Array[Array[Double]],
      k: Int,
      iters: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    val dim = sample.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding
    val centroids = new Array[Array[Double]](k)
    centroids(0) = sample(rnd.nextInt(sample.length)).clone()
    val dist = Array.fill(sample.length)(Double.MaxValue)
    for (c <- 1 until k) {
      var i = 0
      while (i < sample.length) {
        dist(i) = math.min(dist(i), d2(sample(i), centroids(c - 1)))
        i += 1
      }
      val total = dist.sum
      var r = rnd.nextDouble() * total
      var pick = 0
      while (pick < sample.length - 1 && r > dist(pick)) { r -= dist(pick); pick += 1 }
      centroids(c) = sample(pick).clone()
    }
    // Lloyd iterations
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = d2(v, centroids(c)); if (d < bestD) { bestD = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      for (c <- 0 until k if counts(c) > 0; i <- 0 until dim)
        centroids(c)(i) = sums(c)(i) / counts(c)
    }
    centroids
  }

  /** Deterministic uniform init for the DISTRIBUTED trainer: the k
    * rows with the smallest (xxhash64(id, seed), id) — a seeded
    * uniform draw (FAISS-style random-point init; k-means++ is
    * inherently sequential: k dependent passes over the data, k
    * Spark jobs at k ≈ 3×10⁴ — not a distributed init). Runs as a
    * distributed top-k (TakeOrderedAndProject), never materializing
    * the corpus; result order is (hash, id) — partition-independent. */
  private[graft] def hashInit(
      vecs: DataFrame, k: Int, seed: Long): Array[Array[Double]] =
    vecs.select(col("id"), col("v"),
        xxhash64(col("id"), lit(seed)).as("h"))
      .orderBy(col("h"), col("id"))
      .limit(k)
      .collect().map(_.getSeq[Double](1).toArray)

  /** Distributed Lloyd iterations with ORDER-INDEPENDENT arithmetic:
    * assignment is row-local double math (nearest centroid, ties →
    * lowest index), the mean update sums each (cluster, dim) slot as
    * decimal(38,18) — exact, so the result does not depend on
    * partition count or row order — then divides in double. Per
    * round: one broadcast of k×dim centroids, one narrow assignment
    * pass, one partial-aggregated groupBy over (cluster, dim); only
    * k×dim stat rows ever reach the driver. [[lloydDecimalLocal]] is
    * the same algorithm on an array — bit-exact equality between the
    * two is spec-asserted. */
  private[graft] def lloydDecimal(
      vecs: DataFrame, // (id long, v array<double>)
      init: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    val spark = vecs.sparkSession
    val dim = init.head.length
    val centroids = init.map(_.clone())
    for (_ <- 0 until iters) {
      val cB = spark.sparkContext.broadcast(centroids.map(_.clone()))
      val assigned = vecs.rdd.mapPartitions { it =>
        val cs = cB.value
        it.map { r =>
          val v = r.getSeq[Double](1).toArray
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var s = 0.0; var i = 0
            while (i < dim) { val x = v(i) - cs(c)(i); s += x * x; i += 1 }
            if (s < bestD) { bestD = s; best = c }
            c += 1
          }
          Row(best, r.getSeq[Double](1))
        }
      }
      val stats = spark.createDataFrame(assigned, StructType(Seq(
          StructField("list", IntegerType, false),
          StructField("v", ArrayType(DoubleType, true), false))))
        .select(col("list"), posexplode(col("v")))
        .groupBy(col("list"), col("pos"))
        .agg(sum(col("col").cast(DecimalType(38, 18))).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
      cB.destroy()
      stats.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        centroids(c)(d) =
          r.getDecimal(2).doubleValue() / r.getLong(3).toDouble
      }
      // clusters with no points keep their previous centroid (no row)
    }
    centroids
  }

  /** Driver-side reference of [[lloydDecimal]] — IDENTICAL algorithm
    * and arithmetic (java BigDecimal at scale 18, HALF_UP on the cast
    * like Spark's double→decimal(38,18), exact adds, double division)
    * so the two are bit-exact on the same input. Exists for the
    * determinism spec and for callers who already hold a sample. */
  private[graft] def lloydDecimalLocal(
      sample: Array[Array[Double]],
      init: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    val k = init.length
    val dim = init.head.length
    val centroids = init.map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(java.math.BigDecimal.ZERO)
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0; var i = 0
          while (i < dim) { val x = v(i) - centroids(c)(i); s += x * x; i += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) {
          sums(best)(i) = sums(best)(i).add(
            java.math.BigDecimal.valueOf(v(i))
              .setScale(18, java.math.RoundingMode.HALF_UP))
          i += 1
        }
      }
      for (c <- 0 until k if counts(c) > 0; i <- 0 until dim)
        centroids(c)(i) = sums(c)(i).doubleValue() / counts(c).toDouble
    }
    centroids
  }

  /** Distributed coarse-quantizer training — the path that lifts the
    * 512-list driver clamp: hash-uniform init + decimal-exact Lloyd,
    * everything but the k×dim centroids staying distributed. At 10⁹+
    * vectors the √n rule wants ~3×10⁴ lists; a driver-side trainer
    * over a ≤65 536-row sample cannot make that many centroids, this
    * can (the training set itself should still be a hash sample of
    * ~256 rows per centroid, FAISS's max_points_per_centroid — the
    * [[ivfTopKCross]] clamp site does exactly that). Deterministic:
    * same data + seed → same centroids, regardless of partitioning. */
  private[graft] def trainCentroidsDistributed(
      vecs: DataFrame, // (id long, v array<double>)
      k: Int,
      iters: Int,
      seed: Long): Array[Array[Double]] = {
    // pin the training set ONCE: hashInit plus every Lloyd round scan
    // it, and without the checkpoint each pass would replay the full
    // upstream lineage (corpus scan + sample filter) — iters+1 corpus
    // reads instead of one materialization of the (sampled) train set
    val pinned = vecs.localCheckpoint(eager = true)
    val init = hashInit(pinned, k, seed)
    if (init.isEmpty) Array.empty
    else lloydDecimal(pinned, init, iters)
  }

  /** Training samples at or below this row count collect to the
    * driver (k-means++ there is fast and exactly reproducible);
    * beyond it the per-subspace codebooks train with the distributed
    * trainer instead — the driver never materializes the set. */
  private val DriverTrainCap = 65536

  /** Per-subspace PQ codebooks via the distributed trainer — the
    * path for training samples past [[DriverTrainCap]]: the training
    * set stays distributed, each subspace runs the seeded hash-init +
    * decimal-Lloyd loop ([[trainCentroidsDistributed]]), and only
    * k×(dim/m) centroid stats per round reach the driver. Same
    * determinism contract as the coarse trainer: results depend on
    * (data, seed), never on partitioning. `train` must already be
    * normalized (flat PQ) or residualized (IVF-PQ). Returns empty
    * when `train` is empty — callers fall back. */
  private def subspaceCodebooksDistributed(
      train: DataFrame, // (id long, v array<double>)
      m: Int,
      offsets: Array[Int],
      seed: Long): Array[Array[Array[Double]]] = {
    // pin once: all m subspace slices (and their Lloyd rounds) scan it
    val pinned = train.localCheckpoint(eager = true)
    val cnt = pinned.count()
    if (cnt == 0) return Array.empty
    val nCents = math.min(256L, math.max(2L, cnt / 4)).toInt
    (0 until m).map { s =>
      val sub = pinned.select(col("id"),
        slice(col("v"), offsets(s) + 1, offsets(s + 1) - offsets(s)).as("v"))
      trainCentroidsDistributed(sub, nCents, iters = 5, seed + s)
    }.toArray
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are
    * assigned to their nearest centroid's list; each query probes its
    * `nprobe` nearest lists and ranks only those candidates exactly.
    * The 100 TB shape: centroid training touches a sample, the
    * corpus assignment is one narrow pass, and search shuffles only
    * (query, probed-list) pairs — candidates per query ≈
    * nprobe/k of the corpus instead of all of it. */
  /** @param nLists  number of inverted lists; <= 0 derives √n (min
    *                 16, uncapped — lists > 512 train via the
    *                 distributed quantizer instead of the driver
    *                 k-means++ loop).
    * @param nprobe  lists probed per query; <= 0 probes ALL lists
    *                 (exhaustive — the candidate set is complete, so
    *                 the result is the exact top-k for ANY quantizer;
    *                 pair with nLists <= 0 for a scale-adaptive index
    *                 whose oracle stays the brute-force answer; the
    *                 auto-derivation then picks the FLOOR list count,
    *                 since partitioning cannot prune an exhaustive
    *                 probe and per-(query, list) overhead scales with
    *                 the list count).
    * @param sampleSize minimum quantizer training sample; scaled up
    *                 to 32·nLists (capped 65536) so every centroid
    *                 sees enough points. */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = -1,
      nprobe: Int = 4,
      sampleSize: Int = 2000,
      seed: Long = 42L): DataFrame =
    ivfTopKCross(df, df, idCol, vecCol, k, nLists, nprobe, sampleSize, seed)

  /** Coarse-quantizer centroids for an IVF index over `in` (id, v) —
    * ONE definition shared by the IVF and IVF-PQ paths: driver-side
    * k-means++ over a bounded hash sample for ≤ 512 lists, the
    * distributed hash-init + decimal-Lloyd trainer beyond (the 100 TB
    * regime: √n lists at 10⁹+ rows; the corpus never reaches the
    * driver, only k×dim centroid stats per round do). */
  private[graft] def coarseCentroids(
      in: DataFrame, // (id long, v array<double>), non-empty
      n: Long,
      nLists: Int,
      sampleSize: Int,
      seed: Long): Array[Array[Double]] = {
    val lists = if (nLists > 0) nLists
      else math.max(16, math.sqrt(n.toDouble).toInt)
    if (lists <= 512) {
      val target = math.min(65536, math.max(sampleSize, 32 * lists))
      // Deterministic UNIFORM hash sample: a keep-slice of
      // xxhash64(id), not the lowest ids — on real corpora id order
      // correlates with source/time, and a prefix sample trains
      // centroids on one shard. Collected rows are sorted by id
      // driver-side so the training set (and thus the centroids) is
      // independent of partitioning. ceil, not floor: floor(n/target)
      // = 1 for n < 2·target would keep EVERY row; ceil bounds the
      // expected collected sample at target
      val step = math.max(1L, (n + target - 1) / math.max(1, target))
      val slice = in
        .where(pmod(xxhash64(col("id"), lit(seed)), lit(step)) === 0)
        .collect()
      // hash-slice empty despite n > 0 (astronomically unlikely):
      // fall back to a bounded prefix rather than an empty quantizer
      val rows = if (slice.nonEmpty) slice else in.limit(target).collect()
      val sample = rows.sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
      trainCentroids(sample, math.min(lists, sample.length), iters = 5, seed)
    } else {
      val target = math.min(n, 256L * lists)
      val step = math.max(1L, (n + target - 1) / target)
      val train = in.where(pmod(xxhash64(col("id"), lit(seed)), lit(step)) === 0)
      val got = trainCentroidsDistributed(train, lists, iters = 5, seed)
      if (got.nonEmpty) got
      else trainCentroidsDistributed(in, lists, iters = 5, seed)
    }
  }

  /** Query-vs-corpus IVF probe — how ANN is actually served: the
    * quantizer trains on (a sample of) the CORPUS, the corpus is
    * assigned once, and a separate query set probes the prebuilt
    * lists. [[ivfTopK]] is the self-join special case. Rows where a
    * query id equals a corpus id are excluded as self-matches (the
    * family-wide convention). */
  def ivfTopKCross(
      queriesDf: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = -1,
      nprobe: Int = 4,
      sampleSize: Int = 2000,
      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val in = corpus.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val qIn = queriesDf.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // One count job up front: sizes the list count and the sample rate.
    val n = in.count()
    if (n == 0) // empty corpus → empty result, not a crash
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("q", LongType, false),
          StructField("rank", IntegerType, false),
          StructField("n", LongType, false),
          StructField("cos", DoubleType, false))))
    // Probe-aware auto-derivation: under a DECLARED exhaustive probe
    // (nprobe <= 0) the partitioning is a correctness no-op — every
    // list is scanned for every query — so per-(query, list) overhead
    // scales with the list count while the candidate set stays the
    // full corpus; the cheapest valid index is the floor count. A
    // real probe budget gets the √n rule (probed fraction shrinks as
    // the corpus grows).
    val cents = spark.sparkContext.broadcast(
      coarseCentroids(in, n,
        if (nLists <= 0 && nprobe <= 0) 16 else nLists, sampleSize, seed))

    def assign(nearest: Int): DataFrame => DataFrame = { d =>
      val rows = d.rdd.mapPartitions { it =>
        val cs = cents.value
        it.flatMap { r =>
          val id = r.getLong(0)
          val v = r.getSeq[Double](1).toArray
          val byDist = cs.indices.map { c =>
            var s = 0.0; var i = 0
            while (i < v.length) { val x = v(i) - cs(c)(i); s += x * x; i += 1 }
            (c, s)
          }.sortBy(t => (t._2, t._1)).take(nearest)
          byDist.iterator.map { case (c, _) => Row(id, c) }
        }
      }
      d.sparkSession.createDataFrame(rows, StructType(Seq(
        StructField("id", LongType, false),
        StructField("list", IntegerType, false))))
    }

    val corpusLists = assign(1)(in)   // each corpus vector in ONE list
    // nprobe <= 0 → exhaustive probe of every derived list (see scaladoc)
    val queryLists = assign(
      if (nprobe > 0) nprobe else cents.value.length)(qIn)
    val vecs = in.withColumn("nrm", norm(col("v")))
    val qVecs = qIn.withColumn("nrm", norm(col("v")))
    // each corpus vector lives in exactly one list and each query
    // probes a list once ⇒ (q,n) candidates are already unique — no
    // distinct shuffle needed (unlike the multi-table LSH paths)
    val scored = queryLists.select(col("list"), col("id").as("q"))
      .join(corpusLists.select(col("list"), col("id").as("n")), Seq("list"))
      .where(col("q") =!= col("n"))
      .join(qVecs.select(col("id").as("q"), col("v").as("qv"), col("nrm").as("qn")), Seq("q"))
      .join(vecs.select(col("id").as("n"), col("v").as("nv"), col("nrm").as("nn")), Seq("n"))
      .withColumn("cos", cosine(col("qv"), col("nv"), col("qn"), col("nn")))
    topKPerQuery(scored, k)
  }

  /** L2-normalize (zero vectors pass through) — shared by the PQ
    * paths: on unit vectors L2 order == cosine order. */
  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val nn = math.sqrt(s)
    if (nn == 0) v else v.map(_ / nn)
  }

  /** Nearest-codeword PQ encoding of a vector (or residual) under
    * per-subspace codebooks — ONE definition shared by the flat-PQ
    * and IVF-PQ paths. */
  private def pqEncode(
      v: Array[Double],
      cbs: Array[Array[Array[Double]]],
      off: Array[Int]): Array[Byte] = {
    val codes = new Array[Byte](cbs.length)
    var s = 0
    while (s < cbs.length) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cbs(s).length) {
        var d2 = 0.0; var i = off(s)
        val cent = cbs(s)(c)
        while (i < off(s + 1)) {
          val x = v(i) - cent(i - off(s)); d2 += x * x; i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    codes
  }

  /** Per-query ADC lookup table: exact subspace distances of a query
    * (or query residual) to every codeword — shared by both PQ scan
    * paths, so the distance algebra cannot diverge between them. */
  /** Flat ADC lookup table: ONE double[m·256] with stride 256
    * (lut(s·256 + code)), not m separate arrays — the table is built
    * per (query[, probed list]) in the ANN hot loops, where per-build
    * allocation count matters as much as flops. Slots past a
    * subspace's codebook size stay 0 and are never indexed (codes are
    * valid codebook indices by construction). */
  private def adcLutFlat(
      qv: Array[Double],
      cbs: Array[Array[Array[Double]]],
      off: Array[Int]): Array[Double] = {
    val lut = new Array[Double](cbs.length << 8)
    var s = 0
    while (s < cbs.length) {
      val cents = cbs(s)
      val base = s << 8
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d2 = 0.0; var i = off(s)
        while (i < off(s + 1)) {
          val x = qv(i) - cent(i - off(s)); d2 += x * x; i += 1
        }
        lut(base | c) = d2
        c += 1
      }
      s += 1
    }
    lut
  }

  /** Primitive bounded "keep the k smallest (d, id)" heap — the ADC
    * scan kernels' accumulator. A max-heap on (d, id) lexicographic
    * order (root = worst kept) over two parallel primitive arrays:
    * no tuple/Double/Long boxing, no per-candidate allocation, O(1)
    * reject once full. Ties keep the smaller id — identical to the
    * (adist asc, id asc) rank order the family guarantees. */
  private final class DLHeap(cap: Int) {
    private val ds = new Array[Double](cap)
    private val ids = new Array[Long](cap)
    private var n = 0
    @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
      d1 > d2 || (d1 == d2 && i1 > i2)
    def offer(d: Double, id: Long): Unit = {
      if (n < cap) {
        var i = n; ds(i) = d; ids(i) = id; n += 1
        var cont = i > 0
        while (cont) {
          val p = (i - 1) >> 1
          if (worse(ds(i), ids(i), ds(p), ids(p))) {
            val td = ds(i); val ti = ids(i)
            ds(i) = ds(p); ids(i) = ids(p); ds(p) = td; ids(p) = ti
            i = p; cont = i > 0
          } else cont = false
        }
      } else if (worse(ds(0), ids(0), d, id)) {
        ds(0) = d; ids(0) = id
        var i = 0
        var cont = true
        while (cont) {
          val l = (i << 1) + 1; val r = l + 1
          var m = i
          if (l < n && worse(ds(l), ids(l), ds(m), ids(m))) m = l
          if (r < n && worse(ds(r), ids(r), ds(m), ids(m))) m = r
          if (m == i) cont = false
          else {
            val td = ds(i); val ti = ids(i)
            ds(i) = ds(m); ids(i) = ids(m); ds(m) = td; ids(m) = ti
            i = m
          }
        }
      }
    }
    def size: Int = n
    /** Drain in (unspecified) heap order — consumers re-rank. */
    def foreachEntry(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ds(i), ids(i)); i += 1 }
    }
  }

  /** (q, n, cos) candidates → (q, rank, n, cos) top-k per query via
    * the typed Aggregator: map-side partial aggregation caps every
    * task at k rows per query BEFORE the exchange — the candidate
    * stream itself never shuffles (vs a window row_number, which
    * shuffles all candidates to rank them). Ties break cos desc,
    * n asc — deterministic. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val topk = graft.functions.TopKAggregator.TopK(k).toColumn
    scored.select(col("q"), col("n"), col("cos")).as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.name("topk"))
      .toDF("q", "topk")
      .select(col("q"), posexplode(col("topk")))
      .select(col("q"), (col("pos") + 1).as("rank"),
        col("col._1").as("n"), col("col._2").as("cos"))
  }

  /** Product-quantization ANN top-k (Jégou et al., PAMI'11 — the
    * memory-bound 100 TB path): vectors L2-normalize (so L2 order ==
    * cosine order), split into `m` subspaces, each quantized to one
    * of 256 learned centroids ⇒ the corpus becomes m BYTES per vector
    * (32× smaller than float32 at m=dim/4). Search is an asymmetric-
    * distance scan: per query, one m×256 lookup table of exact
    * subspace distances; a corpus vector's approximate distance is m
    * table adds over its codes — no vector arithmetic in the scan.
    *
    * Scale shape: codebooks train on a uniform hash sample
    * driver-side (like [[ivfTopK]]); encoding is one narrow pass; the
    * scan streams the CODES partition-parallel with the query set
    * broadcast, and only per-partition top-k survivors (queries × k ×
    * partitions rows) reach the final exchange. Queries are batched
    * internally so the per-task ADC lookup-table block (m × nCents ×
    * 8 B per query) stays under `maxLutBytes`; multi-batch runs cache
    * the code stream, so extra batches cost one in-memory scan each.
    * The `maxQueryBytes` guard still bounds the driver-side collect.
    *
    * The ADC scan is a coarse ranker: quantization error is on the
    * order of within-cluster distances, so the scan keeps the top
    * `k·rerank` candidates and an EXACT cosine re-rank over those
    * few picks the final k — the standard PQ-then-rerank serving
    * pipeline. Output (q, rank, n, cos). */
  def pqTopK(
      queriesDf: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      rerank: Int = 8,
      sampleSize: Int = 2000,
      seed: Long = 42L,
      maxQueryBytes: Long = 512L << 20,
      maxLutBytes: Long = 256L << 20): DataFrame = {
    val spark = corpus.sparkSession
    val qEst = queriesDf.queryExecution.optimizedPlan.stats.sizeInBytes
    require(qEst >= BigInt(Long.MaxValue) || qEst <= maxQueryBytes,
      s"pqTopK broadcasts the query set (~$qEst bytes > $maxQueryBytes); " +
        "batch the queries — each batch is one compressed corpus scan")
    require(k >= 1 && rerank >= 1, s"need k ($k) >= 1 and rerank ($rerank) >= 1")
    val in = corpus.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val n = in.count()
    def emptyResult() = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("q", LongType, false),
        StructField("rank", IntegerType, false),
        StructField("n", LongType, false),
        StructField("cos", DoubleType, false))))
    if (n == 0) return emptyResult()
    // like ivfTopK: scale the sample so every centroid sees enough
    // points — 256 centroids per subspace want >= 32*256 = 8192. No
    // hard cap: a requested sample past the driver-collect budget
    // trains with the distributed trainer below instead of collecting.
    val target = math.max(sampleSize, 32 * 256)
    val step = math.max(1L, (n + target - 1) / math.max(1, target))
    val sliceDf = in
      .where(pmod(xxhash64(col("id"), lit(seed)), lit(step)) === 0)
    val dim = in.limit(1).collect().head.getSeq[Double](1).length
    require(m >= 1 && m <= dim, s"need 1 <= m ($m) <= dim ($dim)")
    val base = dim / m
    val extra = dim % m
    val offsets = (0 to m).map(s => s * base + math.min(s, extra))
    val codebooks: Array[Array[Array[Double]]] =
      if (target <= DriverTrainCap) {
        val sample = sliceDf.collect().sortBy(_.getLong(0))
          .map(r => normalize(r.getSeq[Double](1).toArray))
        if (sample.isEmpty) return emptyResult()
        // per-subspace codebooks: 256 centroids (fewer when the sample
        // is small — k-means can't make more clusters than points)
        val nCents = math.min(256, math.max(2, sample.length / 4))
        // the m subspace codebooks are independent seeded k-means runs
        // — train them in parallel (each is pure in its arguments,
        // results land at distinct indices, values identical to the
        // sequential loop); this was the q46 driver-side bottleneck
        val cbs = new Array[Array[Array[Double]]](m)
        java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
          val sub = sample.map(_.slice(offsets(s), offsets(s + 1)))
          cbs(s) = trainCentroids(sub, nCents, iters = 5, seed + s)
        }
        cbs
      } else {
        // distributed: normalize in-plan (norm projected once — HOF
        // bodies evaluate per element) and train each subspace slice
        // without ever collecting the sample
        def normed(src: DataFrame) = src.withColumn("nrm", norm(col("v")))
          .select(col("id"),
            when(col("nrm") === 0, col("v"))
              .otherwise(transform(col("v"), x => x / col("nrm"))).as("v"))
        val got = subspaceCodebooksDistributed(
          normed(sliceDf), m, offsets.toArray, seed)
        if (got.nonEmpty) got
        else subspaceCodebooksDistributed(normed(in), m, offsets.toArray, seed)
      }
    val cbB = spark.sparkContext.broadcast(codebooks)
    val offB = spark.sparkContext.broadcast(offsets.toArray)

    def encodeCodes(v: Array[Double]): Array[Byte] =
      pqEncode(v, cbB.value, offB.value)

    // the (normalized) query set rides a broadcast; the corpus
    // streams as codes
    val queries = queriesDf
      .select(col(idCol).cast(LongType).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .collect().map(r =>
        (r.getLong(0), normalize(r.getSeq[Double](1).toArray)))
      .sortBy(_._1)

    if (queries.isEmpty) { // empty query set → empty result, not a crash
      cbB.destroy(); offB.destroy()
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("q", LongType, false),
          StructField("rank", IntegerType, false),
          StructField("n", LongType, false),
          StructField("cos", DoubleType, false))))
    }
    // ADC lookup tables cost m × nCents × 8 B PER QUERY per task —
    // the dominant task memory, and the query-VECTOR byte guard above
    // underestimates it for small dim / large m. Batch the queries so
    // a task's LUT block stays under maxLutBytes; each batch is one
    // scan over the (cached, m-bytes-per-vector) code stream.
    // nCents varies per subspace only in degenerate tiny-sample runs;
    // the max is the right sizing bound either way
    val lutBytesPerQuery = m.toLong * codebooks.map(_.length).max * 8
    val batchSize = math.max(1, (maxLutBytes / lutBytesPerQuery).toInt)
    val batches = queries.grouped(batchSize).toArray
    val codeRows = in.rdd.mapPartitions(_.map { r =>
      (r.getLong(0), encodeCodes(normalize(r.getSeq[Double](1).toArray)))
    })
    val multiBatch = batches.length > 1
    if (multiBatch)
      codeRows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qBs = batches.map(b => spark.sparkContext.broadcast(b))
    val partials = qBs.map(qB => scanBatch(codeRows, qB, cbB, offB, k * rerank))
      .reduce(_ union _)
    var partialDf = spark.createDataFrame(partials, StructType(Seq(
      StructField("q", LongType, false),
      StructField("n", LongType, false),
      StructField("adist", DoubleType, false))))
    // materialize the (small: queries × k·rerank × partitions rows)
    // survivor set NOW so the cached code stream and the per-batch
    // query broadcasts can be released instead of pinning executor
    // memory until ContextCleaner GC of the lineage — unconditional:
    // the single-batch path's broadcast would otherwise stay alive
    // for the lifetime of a long-lived session
    partialDf = partialDf.localCheckpoint(eager = true)
    if (multiBatch) codeRows.unpersist(blocking = false)
    qBs.foreach(_.destroy())
    // the exact re-rank below uses the raw vectors only — the
    // codebook/offset broadcasts are dead once the ADC survivors are
    // materialized, and would otherwise accumulate across calls in a
    // long-lived session until ContextCleaner GC
    cbB.destroy()
    offB.destroy()
    // global candidate merge (smaller ADC distance is better ⇒ negate
    // for the descending-score aggregator), then EXACT cosine re-rank
    // of the k·rerank survivors per query
    val cand = topKPerQuery(partialDf.withColumn("cos", -col("adist")),
        k * rerank)
      .select(col("q"), col("n"))
    val vecs = in.withColumn("nrm", norm(col("v")))
    val qVecs = queriesDf
      .select(col(idCol).cast(LongType).as("q"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = cand
      .join(qVecs, Seq("q"))
      .join(vecs.select(col("id").as("n"), col("v").as("nv"),
        col("nrm").as("nn")), Seq("n"))
      .withColumn("cos", cosine(col("qv"), col("nv"), col("qn"), col("nn")))
    topKPerQuery(scored, k)
  }

  /** One ADC scan of the code stream for one query batch: per
    * (partition, query) lookup table of exact subspace distances,
    * per-query top-`keep` heaps, ≤ keep rows per (partition, query)
    * emitted. */
  private def scanBatch(
      codeRows: org.apache.spark.rdd.RDD[(Long, Array[Byte])],
      qB: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Double])]],
      cbB: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]],
      offB: org.apache.spark.broadcast.Broadcast[Array[Int]],
      keep: Int): org.apache.spark.rdd.RDD[Row] =
    codeRows.mapPartitions { it =>
      val qs = qB.value; val cbs = cbB.value; val off = offB.value
      // one flat ADC lookup table per query, built once per
      // (partition, query) via the shared kernel
      val luts = qs.map { case (_, qv) => adcLutFlat(qv, cbs, off) }
      // per-query primitive top-k heaps over this partition's codes
      val heaps = Array.fill(qs.length)(new DLHeap(keep))
      it.foreach { case (id, codes) =>
        var qi = 0
        while (qi < qs.length) {
          if (qs(qi)._1 != id) {
            val lut = luts(qi)
            var d = 0.0; var s = 0
            while (s < codes.length) {
              d += lut((s << 8) | (codes(s) & 0xff)); s += 1
            }
            heaps(qi).offer(d, id)
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val rows = new scala.collection.mutable.ArrayBuffer[Row](h.size)
        h.foreachEntry((d, id) => rows += Row(qs(qi)._1, id, d))
        rows.iterator
      }
    }

  /** Composite IVF-PQ top-k (Jégou et al., PAMI'11 §V — the FAISS
    * big-corpus serving shape): the coarse quantizer partitions the
    * (normalized) corpus into inverted lists, each vector stores only
    * the m-byte PQ code of its RESIDUAL (v − centroid(list)), and a
    * query probes its `nprobe` nearest lists, ADC-scanning just those
    * lists' codes — ~nprobe/nLists of the corpus touched per query at
    * m bytes per vector, the memory-AND-compute-bound path for 10⁹+
    * corpora ([[ivfTopKCross]] scans raw vectors of probed lists;
    * [[pqTopK]] scans ALL codes).
    *
    * Shapes: coarse centroids via [[coarseCentroids]] (distributed
    * trainer past 512 lists); one shared residual codebook set
    * across lists (the standard formulation) trained on a hash
    * sample; encoding is one narrow pass; the index is one row per
    * (list, sub-block) with oversized lists hash-split at
    * `maxBlockRows` (no unbounded row under quantizer skew); search
    * joins (query, probed-list) pairs
    * to their list blocks — the per-(query, list) ADC lookup table
    * (m×256×(dim/m) flops) amortizes over the whole block's codes at
    * m adds each. Exact cosine re-rank of the k·rerank ADC survivors
    * picks the final k. Output (q, rank, n, cos). */
  def ivfpqTopKCross(
      queriesDf: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = -1,
      nprobe: Int = 8,
      m: Int = 8,
      rerank: Int = 8,
      sampleSize: Int = 2000,
      seed: Long = 42L,
      maxBlockRows: Int = 1 << 16): DataFrame = {
    val spark = corpus.sparkSession
    // nprobe <= 0 → exhaustive probe of every derived list (resolved
    // after the coarse quantizer sizes itself, same as [[ivfTopKCross]])
    require(k >= 1 && rerank >= 1 && maxBlockRows >= 1,
      s"need k ($k), rerank ($rerank), maxBlockRows ($maxBlockRows) >= 1")
    val in = corpus.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val qIn = queriesDf.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val n = in.count()
    def emptyResult() = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("q", LongType, false),
        StructField("rank", IntegerType, false),
        StructField("n", LongType, false),
        StructField("cos", DoubleType, false))))
    if (n == 0) return emptyResult()
    // coarse quantizer over NORMALIZED vectors (L2 on unit vectors ==
    // cosine ranking, the family's metric). Project the norm ONCE and
    // reference the attribute inside the lambda — higher-order-fn
    // bodies evaluate per element, so an inline sqrt(dot) would cost
    // O(dim²) per row
    val inNorm = in.withColumn("nrm", norm(col("v")))
      .select(col("id"),
        when(col("nrm") === 0, col("v"))
          .otherwise(transform(col("v"), x => x / col("nrm"))).as("v"))
    // probe-aware auto-derivation under exhaustive probe — see
    // [[ivfTopKCross]]; doubly so here, where every probed (query,
    // list) pair pays an m·256-entry ADC LUT build
    val cents = coarseCentroids(inNorm, n,
      if (nLists <= 0 && nprobe <= 0) 16 else nLists, sampleSize, seed)
    val cB = spark.sparkContext.broadcast(cents)
    // residual PQ codebooks from a hash sample (shared across lists).
    // This is a SECOND sample next to coarseCentroids' — they size
    // differently by design (32·nLists vs 32·256 rows) and both are
    // narrow id+vector scans, dwarfed by the full encode pass below.
    // No hard cap: past the driver-collect budget the subspaces train
    // with the distributed trainer (residuals stay on the executors).
    val target = math.max(sampleSize, 32 * 256)
    val step = math.max(1L, (n + target - 1) / math.max(1, target))
    val sliceDf = in
      .where(pmod(xxhash64(col("id"), lit(seed)), lit(step)) === 0)
    val dim = cents(0).length // trained on the corpus, so dim == |v|
    require(m >= 1 && m <= dim, s"need 1 <= m ($m) <= dim ($dim)")
    val base = dim / m
    val extra = dim % m
    val offsets = (0 to m).map(s => s * base + math.min(s, extra)).toArray
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var s = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - cs(c)(i); s += x * x; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    }
    def residual(v: Array[Double], cent: Array[Double]): Array[Double] = {
      val r = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { r(i) = v(i) - cent(i); i += 1 }
      r
    }
    val codebooks: Array[Array[Array[Double]]] =
      if (target <= DriverTrainCap) {
        val slice = sliceDf.collect()
        val sampleRows =
          (if (slice.nonEmpty) slice else in.limit(target).collect())
            .sortBy(_.getLong(0)).map(r => normalize(r.getSeq[Double](1).toArray))
        val residuals = sampleRows.map(v => residual(v, cents(nearest(v, cents))))
        val nCents = math.min(256, math.max(2, residuals.length / 4))
        val cbs = new Array[Array[Array[Double]]](m)
        java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
          val sub = residuals.map(_.slice(offsets(s), offsets(s + 1)))
          cbs(s) = trainCentroids(sub, nCents, iters = 5, seed + s)
        }
        cbs
      } else {
        // distributed: normalize + residualize against the broadcast
        // coarse centroids executor-side, then train each subspace
        // slice without collecting the sample
        def residualDf(src: DataFrame) = spark.createDataFrame(
          src.rdd.map { r =>
            val v = normalize(r.getSeq[Double](1).toArray)
            Row(r.getLong(0),
              residual(v, cB.value(nearest(v, cB.value))).toSeq)
          },
          StructType(Seq(StructField("id", LongType, false),
            StructField("v", ArrayType(DoubleType, false), false))))
        val got = subspaceCodebooksDistributed(
          residualDf(sliceDf), m, offsets, seed)
        if (got.nonEmpty) got
        else subspaceCodebooksDistributed(residualDf(in), m, offsets, seed)
      }
    val cbB = spark.sparkContext.broadcast(codebooks)
    val offB = spark.sparkContext.broadcast(offsets)

    // one narrow encoding pass → the PQ-compressed corpus (~(8+m) B
    // per vector — fitting THIS is the format's point). Pinned once:
    // the per-list sizing pass and the block build both scan it, and
    // without the checkpoint each would replay the encode.
    val encoded = spark.createDataFrame(
      in.rdd.mapPartitions(_.map { r =>
        val v = normalize(r.getSeq[Double](1).toArray)
        val l = nearest(v, cB.value)
        Row(l, r.getLong(0),
          pqEncode(residual(v, cB.value(l)), cbB.value, offB.value))
      }),
      StructType(Seq(StructField("list", IntegerType, false),
        StructField("id", LongType, false),
        StructField("codes", BinaryType, false))))
      .localCheckpoint(eager = true)
    // Index rows are (list, sub-block): a list bigger than
    // maxBlockRows splits into ceil(size/maxBlockRows) hash
    // sub-blocks, so no single row is unbounded under quantizer skew
    // (one collect_list row per LIST would concentrate a hot list's
    // entire code set in one task/row at the 10⁹-vector regime).
    // Search is invariant to the chunking: each probed list's codes
    // are scanned exactly once across its blocks, and the global
    // top-k of unioned per-block top-k survivors equals the
    // unchunked answer. Lists at/below the bound keep one block —
    // the LUT-per-(query, block) amortization is unchanged there.
    // Effective block size: the caller's maxBlockRows stays the
    // task-memory CEILING, but when the corpus is large enough that
    // ceiling-sized blocks would leave cores idle (nLists=16 at 200k
    // vectors → 16 single-block scan tasks on a 32-core session,
    // measured 265-s-median tasks at the 100× scale proof), split
    // lists further so the scan stage has ≳4 blocks per core. The
    // 4096-row floor keeps the per-(query, block) LUT build (m·256
    // subspace distances) amortized over ≥4k code scans, so the
    // extra blocks buy parallelism without LUT-bound re-work.
    val rawSizes = encoded.groupBy(col("list")).count().collect()
    val totalRows = rawSizes.map(_.getLong(1)).sum
    val targetBlocks = 4L * spark.sparkContext.defaultParallelism
    val effBlockRows = math.min(maxBlockRows.toLong,
      math.max(4096L, totalRows / math.max(1L, targetBlocks))).toInt
    val listSizes = rawSizes
      .map(r => Row(r.getInt(0),
        math.max(1L, (r.getLong(1) + effBlockRows - 1) / effBlockRows).toInt))
    val nBlkDf = spark.createDataFrame(
      spark.sparkContext.parallelize(listSizes.toSeq, 1),
      StructType(Seq(StructField("list", IntegerType, false),
        StructField("nblk", IntegerType, false))))
    val blocks = encoded.join(broadcast(nBlkDf), Seq("list"))
      .groupBy(col("list"),
        pmod(xxhash64(col("id")), col("nblk")).cast("int").as("blkno"))
      .agg(collect_list(struct(col("id"), col("codes"))).as("blk"))
      .select("list", "blkno", "blk")

    // queries: normalize + nprobe nearest lists, REPLICATED per list
    // block — the scan join below keys on (list, blkno), not list
    // alone, so its parallelism grows with the BLOCK count (∝ corpus
    // size / maxBlockRows) instead of capping at nLists distinct
    // keys. At 100× corpus (200k vectors, nLists 16) the list-keyed
    // join ran its whole 277-s-median scan on ≤16 tasks of a 32-core
    // session; block-keyed, every core holds a bounded block. The
    // LUT is computed per joined row either way, so the replication
    // adds no ADC work — only (nblk-1) extra copies of each probed
    // query vector through the exchange.
    val qAssigned = spark.createDataFrame(
      qIn.rdd.mapPartitions { it =>
        val cs = cB.value
        it.flatMap { r =>
          val qv = normalize(r.getSeq[Double](1).toArray)
          val byDist = cs.indices.map { c =>
            var s = 0.0; var i = 0
            while (i < qv.length) { val x = qv(i) - cs(c)(i); s += x * x; i += 1 }
            (c, s)
          }.sortBy(t => (t._2, t._1))
            .take(if (nprobe > 0) nprobe else cs.length)
          byDist.iterator.map { case (c, _) =>
            Row(c, r.getLong(0), qv.toSeq) }
        }
      },
      StructType(Seq(StructField("list", IntegerType, false),
        StructField("q", LongType, false),
        StructField("qv", ArrayType(DoubleType, false), false))))
      .join(broadcast(nBlkDf), Seq("list"))
      .select(col("list"), explode(sequence(lit(0), col("nblk") - 1))
        .as("blkno"), col("q"), col("qv"))

    // (query, probed-list) × list block → per-pair ADC scan; ≤
    // k·rerank survivors per (query, list) emitted
    val keep = k * rerank
    // per-PARTITION per-query merged heaps, not a heap per (query,
    // list) pair: a query probing p of this partition's lists feeds
    // ONE primitive heap, so the stage emits ≤ keep rows per (query,
    // partition) instead of ≤ keep per (query, list) — at exhaustive
    // probe that's the difference between the aggregator ingesting
    // the whole scanned corpus and ingesting the pre-merged
    // survivors. Correct because lists partition the corpus (an id
    // reaches a given query's heap at most once) and top-keep of a
    // union is the top-keep of per-part top-keeps. The heap map is
    // flushed at `flushAt` distinct queries to bound task memory on
    // serving shapes with huge query sets — the aggregator re-merges
    // flushed fragments exactly like cross-partition ones.
    val flushAt = 8192
    val partials = qAssigned.join(blocks, Seq("list", "blkno"))
      .select("list", "q", "qv", "blk").rdd.mapPartitions { it =>
      val cs = cB.value; val cbs = cbB.value; val off = offB.value
      val heaps = new java.util.LinkedHashMap[Long, DLHeap]()
      val out = new scala.collection.mutable.ArrayBuffer[Row]()
      def flush(): Unit = {
        val hit = heaps.entrySet().iterator()
        while (hit.hasNext) {
          val en = hit.next()
          val q = en.getKey
          en.getValue.foreachEntry((d, id) => out += Row(q, id, d))
        }
        heaps.clear()
      }
      it.foreach { r =>
        val list = r.getInt(0)
        val q = r.getLong(1)
        val qres = residual(r.getSeq[Double](2).toArray, cs(list))
        // flat ADC lookup table for THIS (query, list) via the shared
        // kernel: exact subspace distances of the query residual
        val lut = adcLutFlat(qres, cbs, off)
        var heap = heaps.get(q)
        if (heap == null) {
          if (heaps.size >= flushAt) flush()
          heap = new DLHeap(keep); heaps.put(q, heap)
        }
        val blk = r.getSeq[Row](3)
        blk.foreach { e =>
          val id = e.getLong(0)
          if (id != q) {
            val codes = e.getAs[Array[Byte]](1)
            var d = 0.0; var s = 0
            while (s < codes.length) { d += lut((s << 8) | (codes(s) & 0xff)); s += 1 }
            heap.offer(d, id)
          }
        }
      }
      flush()
      out.iterator
    }
    val partialDf = spark.createDataFrame(partials, StructType(Seq(
      StructField("q", LongType, false),
      StructField("n", LongType, false),
      StructField("adist", DoubleType, false))))
    // merge per-(query, list) survivors through the map-side top-k
    // aggregator FIRST (each task caps at `keep` rows per query before
    // the exchange — under exhaustive probe the raw partials are
    // q×nLists×keep rows, the merged set only q×keep), and
    // materialize THAT before releasing the broadcasts (same hygiene
    // as pqTopK, at a fraction of the checkpointed volume)
    val cand = topKPerQuery(partialDf.withColumn("cos", -col("adist")), keep)
      .select(col("q"), col("n"))
      .localCheckpoint(eager = true)
    cB.destroy(); cbB.destroy(); offB.destroy()
    val vecs = in.withColumn("nrm", norm(col("v")))
    val qVecs = qIn
      .select(col("id").as("q"), col("v").as("qvv"))
      .withColumn("qn", norm(col("qvv")))
    val scored = cand
      .join(qVecs, Seq("q"))
      .join(vecs.select(col("id").as("n"), col("v").as("nv"),
        col("nrm").as("nn")), Seq("n"))
      .withColumn("cos", cosine(col("qvv"), col("nv"), col("qn"), col("nn")))
    topKPerQuery(scored, k)
  }

  /** Self-join convenience form of [[ivfpqTopKCross]]. */
  def ivfpqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = -1,
      nprobe: Int = 8,
      m: Int = 8,
      rerank: Int = 8,
      sampleSize: Int = 2000,
      seed: Long = 42L,
      maxBlockRows: Int = 1 << 16): DataFrame =
    ivfpqTopKCross(df, df, idCol, vecCol, k, nLists, nprobe, m, rerank,
      sampleSize, seed, maxBlockRows)

  /** Embedding near-duplicate pairs: all (a < b) with cosine ≥
    * threshold, via hyperplane-LSH bucket candidates + exact
    * verification — the embedding-space member of the dedup family.
    * High thresholds (≳0.8) are exactly LSH's strong regime: near-
    * parallel vectors collide in some table w.h.p., so candidates
    * stay ≪ n² while recall stays ~1. */
  def cosineNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val sig = buckets(df, idCol, vecCol, tables, bits, seed)
    val cand = sig.select(col("table"), col("bucket"), col("id").as("a"))
      .join(sig.select(col("table"), col("bucket"), col("id").as("b")),
        Seq("table", "bucket"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    val vecs = df.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    cand
      .join(vecs.select(col("id").as("a"), col("v").as("av"), col("nrm").as("an")), Seq("a"))
      .join(vecs.select(col("id").as("b"), col("v").as("bv"), col("nrm").as("bn")), Seq("b"))
      .withColumn("cos", cosine(col("av"), col("bv"), col("an"), col("bn")))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): embeddings with cosine ≥ threshold are semantic
    * duplicates, the near-dup graph's connected components are the
    * semantic clusters, and each cluster keeps its minimum id —
    * whole-document near-dedup lifted into embedding space, catching
    * paraphrases exact/shingle dedup can't see.
    *
    * Composition of two already-scale-shaped pieces: pair discovery
    * is [[cosineNearDup]] (hyperplane-LSH buckets + exact cosine
    * verify — never all-pairs), components are [[Dedup.clusters]]
    * (alternating large/small-star contraction, O(log n) rounds).
    * Output: one row per input id — (id, cluster, kept) with
    * cluster = the component's min id and kept = (id == cluster). */
  def dedupSemantic(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val pairs = cosineNearDup(df, idCol, vecCol, threshold, tables, bits, seed)
      .select("a", "b")
    val ids = df.select(col(idCol).cast(LongType).as("id"))
    Dedup.clusters(ids, pairs)
      .withColumn("kept", col("id") === col("cluster"))
  }

  /** Cross-corpus embedding near-duplicate pairs: every (a, b) with
    * a from `left`, b from `right`, cosine ≥ threshold — the
    * embedding-space decontamination primitive, completing the
    * cross-corpus family ([[Dedup.jaccardJoinCross]] /
    * [[Dedup.decontaminateSubstring]] are its text-space siblings).
    * Both sides hash with the SAME deterministic hyperplane family
    * (seed + dimension), so a left vector collides with exactly the
    * right vectors it would collide with in a self-join; candidates
    * come from the bucket equi-join (never all-pairs), verification
    * is exact cosine. No `a < b` dedup — sides are distinct corpora,
    * every ordered pair is a result (rows with a == b are excluded as
    * self-matches, the family-wide convention). At 100 TB the typical
    * right side is a small eval set: its bucket index bounds the
    * join. */
  def cosineNearDupCross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val lSig = buckets(left, idCol, vecCol, tables, bits, seed)
    val rSig = buckets(right, idCol, vecCol, tables, bits, seed)
    val cand = lSig.select(col("table"), col("bucket"), col("id").as("a"))
      .join(rSig.select(col("table"), col("bucket"), col("id").as("b")),
        Seq("table", "bucket"))
      .where(col("a") =!= col("b"))
      .select("a", "b").distinct() // pairs recur across tables
    def vecsOf(df: DataFrame): DataFrame =
      df.select(col(idCol).cast(LongType).as("id"),
        col(vecCol).cast("array<double>").as("v"))
        .withColumn("nrm", norm(col("v")))
    cand
      .join(vecsOf(left)
        .select(col("id").as("a"), col("v").as("av"), col("nrm").as("an")), Seq("a"))
      .join(vecsOf(right)
        .select(col("id").as("b"), col("v").as("bv"), col("nrm").as("bn")), Seq("b"))
      .withColumn("cos", cosine(col("av"), col("bv"), col("an"), col("bn")))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Embedding-space decontamination: drop every `corpus` row whose
    * vector has cosine ≥ threshold against ANY `contam` row — the
    * [[Dedup.decontaminate]] pattern in embedding space (catches
    * paraphrased eval leakage that n-gram overlap misses). Candidates
    * via [[cosineNearDupCross]], one left_anti on the corpus id.
    * Recall is LSH-bounded like the text path: a pair at cosine c
    * collides in one table's bucket with probability
    * (1 − θ(c)/π)^bits, θ = arccos(c) — near-parallel vectors
    * (c ≳ 0.9) collide in some table w.h.p. at the defaults. */
  def decontaminateEmbedding(
      corpus: DataFrame,
      contam: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val bad = cosineNearDupCross(corpus, contam, idCol, vecCol, threshold,
      tables, bits, seed)
      .select(col("a").as(idCol)).distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Approximate top-k via random-hyperplane LSH buckets → exact
    * cosine rank. Same output shape as [[bruteForceTopK]]. Best in
    * the high-similarity regime (near-duplicate embeddings, cos ≳
    * 0.8); for mid-similarity ANN use [[ivfTopK]]. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      bits: Int = 12,
      seed: Long = 42L): DataFrame =
    lshTopKCross(df, df, idCol, vecCol, k, tables, bits, seed)

  /** Query-vs-corpus hyperplane-LSH probe: both sides hash with the
    * SAME deterministic hyperplane family (seed + dimension), so a
    * query collides with exactly the corpus vectors it would have
    * collided with inside one frame — probing a prebuilt index with a
    * separate query set returns the self-join's result restricted to
    * those queries. [[lshTopK]] is the queries == corpus case. */
  def lshTopKCross(
      queriesDf: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      bits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val qSig = buckets(queriesDf, idCol, vecCol, tables, bits, seed)
    val cSig = buckets(corpus, idCol, vecCol, tables, bits, seed)
    val cand = qSig.select(col("table"), col("bucket"), col("id").as("q"))
      .join(cSig.select(col("table"), col("bucket"), col("id").as("n")),
        Seq("table", "bucket"))
      .where(col("q") =!= col("n"))
      .select("q", "n").distinct() // pairs recur across tables
    def vecsOf(df: DataFrame): DataFrame =
      df.select(col(idCol).cast(LongType).as("id"),
        col(vecCol).cast("array<double>").as("v"))
        .withColumn("nrm", norm(col("v")))
    val scored = cand
      .join(vecsOf(queriesDf)
        .select(col("id").as("q"), col("v").as("qv"), col("nrm").as("qn")), Seq("q"))
      .join(vecsOf(corpus)
        .select(col("id").as("n"), col("v").as("nv"), col("nrm").as("nn")), Seq("n"))
      .withColumn("cos", cosine(col("qv"), col("nv"), col("qn"), col("nn")))
    topKPerQuery(scored, k)
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein
    * 1998): from the query's top-`poolSize` cosine candidates, pick
    * `k` results greedily by `lambda·rel − mu·max_sim_to_selected` —
    * relevance with a diversity penalty, the standard re-rank between
    * ANN retrieval and serving.
    *
    * Scale shape: the candidate pool is a DISTRIBUTED exact-cosine
    * top-R (one pass, map-side heaps via TakeOrdered); only those R
    * rows collect (the bounded serving contract, like the ANN query
    * broadcasts), and the O(k·R) greedy runs on them. `mu` is an
    * explicit parameter, NOT computed as 1−lambda: 1−0.7 is
    * 0.30000000000000004 in IEEE — an oracle writing the literal 0.3
    * would silently disagree.
    *
    * @return (rank, vec_id) — the selection order, integers only.
    */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, poolSize: Int,
                lambda: Double, mu: Double): DataFrame = {
    require(k >= 1 && poolSize >= k, "mmrSelect: need poolSize >= k >= 1")
    val spark = corpus.sparkSession
    val qRows = corpus.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).collect()
    require(qRows.nonEmpty, s"mmrSelect: query id $queryId not found")
    val qv = qRows(0).getSeq[Double](0).toArray
    val qn = math.sqrt(qv.map(x => x * x).sum)
    require(qn > 0, s"mmrSelect: query vector $queryId has zero norm")
    val dotQ = qv.indices
      .map(i => element_at(col("v"), i + 1) * lit(qv(i)))
      .reduce(_ + _)
    val pool = corpus.where(col(idCol) =!= queryId)
      .select(col(idCol).cast(LongType).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      // zero-norm rows would score rel = NaN, and NaN sorts GREATEST
      // under desc — they'd flood the pool and leave the greedy loop
      // with no valid argmax; cosine is undefined for them anyway
      .where(graft.functions.DotProduct(col("v"), col("v")) > 0)
      .withColumn("rel", dotQ / (norm(col("v")) * lit(qn)))
      .orderBy(col("rel").desc, col("id"))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p).toIndexedSeq: _*)
    while (selected.size < k && remaining.nonEmpty) {
      // argmax score, ties → lowest id (iterate ascending-id order of
      // the pool, strict > keeps the first/lowest winner)
      var best: (Long, Array[Double], Double) = null
      var bestScore = Double.NegativeInfinity
      remaining.valuesIterator.foreach { case (id, v, rel) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => cos(v, s._2)).max
        val score = lambda * rel - mu * maxSim
        if (score > bestScore ||
          (score == bestScore && (best == null || id < best._1))) {
          bestScore = score; best = (id, v, rel)
        }
      }
      selected += ((best._1, best._2))
      remaining.remove(best._1)
    }
    import spark.implicits._
    selected.toIndexedSeq.zipWithIndex
      .map { case ((id, _), i) => (i + 1L, id) }
      .toDF("rank", "vec_id")
  }

  /** Nearest-seed partition assignment — the ASSIGN half of Lloyd's
    * iteration as a standalone corpus-partitioning operator (the
    * update half, decimal-exact distributed means, lives in
    * [[trainCentroidsDistributed]]; the full loop is oracle-gated
    * end-to-end through the IVF family). Seeds are the k lowest-id
    * vectors — a deterministic, data-derived medoid seeding, so a
    * cross-engine oracle can reconstruct them relationally.
    *
    * Scale shape: seeds collect to the driver (k rows — the same
    * bounded-contract collect as the ANN query-set broadcasts) and
    * unroll into LITERAL codegen expressions, so assignment is a
    * SHUFFLE-FREE map over the corpus: k·dim fused multiply-adds per
    * row inside whole-stage codegen, argmin via one array_min +
    * array_position (ties → lowest seed id, matching the oracle's
    * (dist, sid) order). The only exchange is the final cluster-size
    * window.
    *
    * @return (id, cluster = seed id, cluster_n) — integer-only
    *         output (suite invariant for similarity operators).
    */
  def seedAssign(vecs: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame = {
    require(k >= 1 && k <= 256, s"seedAssign: k in [1, 256], got $k")
    val seeds: Array[(Long, Array[Double])] =
      vecs.orderBy(col(idCol)).limit(k)
        .select(col(idCol).cast(LongType),
          col(vecCol).cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(seeds.nonEmpty, "seedAssign: empty input")
    // ‖x−s‖² = x·x − 2·x·s + ‖s‖² through the DotProduct kernel: k
    // compact codegen calls instead of a k·dim-term unrolled sum,
    // whose janino compilation dominated the query at k·dim ≈ 512.
    // The expansion reorders the float ops vs the oracle's Σ(x−s)²
    // — covered by the >1e-9 argmin-margin gate (SimilaritySpec).
    val withV = vecs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("__xv"))
    val xx = graft.functions.DotProduct(col("__xv"), col("__xv"))
    val dists: Seq[Column] = seeds.toIndexedSeq.map { case (_, s) =>
      xx - lit(2.0) * graft.functions.DotProduct(col("__xv"),
        typedLit(s.toSeq)) + lit(s.map(x => x * x).sum)
    }
    val ids = array(seeds.map(s => lit(s._1)).toIndexedSeq: _*)
    val darr = array(dists: _*)
    val cluster = element_at(ids,
      array_position(darr, array_min(darr)).cast("int"))
    val sizes = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
    withV.select(col("id"), cluster.as("cluster"))
      .withColumn("cluster_n", count(lit(1)).over(sizes))
  }

  /** Full Lloyd k-means — `rounds` assignment passes with exact mean
    * updates between them — made cross-engine replayable by running
    * on 10⁻⁶-QUANTIZED vectors: `q_j = bround(x_j · 10⁶)` as BIGINT
    * (half-even ties both engines — the suite's bround ≡ round_even
    * invariant). Every centroid update is then an INTEGER sum per
    * dimension plus ONE pinned double division `s_j / n` — no decimal
    * scale rules, no fold-order doubles — so engine and oracle derive
    * bit-identical centroids, and the only approximate step left is
    * the double argmin, gated by the q84 margin pattern
    * (SimilaritySpec: >1e-9 relative separation per round at sf0.01
    * and sf0.1). Seeds are the k lowest-id vectors (q84's
    * relationally reconstructable medoid seeding); an emptied cluster
    * keeps its previous centroid; cluster ids stay the seed ids.
    *
    * Scale shape per round: assignment is the [[seedAssign]] kernel —
    * centroids unroll into literal codegen DotProduct expressions, a
    * SHUFFLE-FREE map over the corpus; the update is one groupBy(k)
    * carrying dim partial long sums (map-side combine, k·dim·8 B per
    * task); the driver hop is k·(dim+1) longs per round — bounded by
    * k and dim, never by corpus size. The quantized frame is
    * localCheckpoint'ed once, so rounds don't replay lineage.
    *
    * @return (id, cluster = seed id, cluster_n) — integer-only
    *         output (suite invariant for similarity operators).
    */
  def lloydKMeans(vecs: DataFrame, idCol: String, vecCol: String,
                  k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && k <= 256, s"lloydKMeans: k in [1, 256], got $k")
    require(rounds >= 1 && rounds <= 16,
      s"lloydKMeans: rounds in [1, 16], got $rounds")
    val q = vecs.select(col(idCol).cast(LongType).as("id"),
        transform(col(vecCol).cast("array<double>"),
          e => bround(e * lit(1000000.0)).cast(LongType)).as("qv"))
      .withColumn("xd", transform(col("qv"), _.cast(DoubleType)))
      .localCheckpoint(eager = true)
    val dimRow = q.agg(min(size(col("qv"))), max(size(col("qv")))).head()
    require(!dimRow.isNullAt(0), "lloydKMeans: empty input")
    val dim = dimRow.getInt(0)
    require(dim == dimRow.getInt(1),
      s"lloydKMeans: ragged vectors ($dim vs ${dimRow.getInt(1)})")
    var cents: IndexedSeq[(Long, Array[Double])] =
      q.orderBy("id").limit(k).select(col("id"), col("xd")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toIndexedSeq
    def assign(): DataFrame = {
      val xx = graft.functions.DotProduct(col("xd"), col("xd"))
      val dists = cents.map { case (_, m) =>
        xx - lit(2.0) * graft.functions.DotProduct(col("xd"),
          typedLit(m.toSeq)) + lit(m.map(v => v * v).sum)
      }
      val ids = array(cents.map(c => lit(c._1)): _*)
      val darr = array(dists: _*)
      q.withColumn("cluster",
        element_at(ids, array_position(darr, array_min(darr)).cast("int")))
    }
    var assigned = assign()
    for (_ <- 1 until rounds) {
      val aggs = count(lit(1)).as("n") +:
        (0 until dim).map(j => sum(element_at(col("qv"), j + 1)).as(s"s$j"))
      val stats = assigned.groupBy("cluster")
        .agg(aggs.head, aggs.tail: _*).collect()
        .map { r =>
          val n = r.getLong(1)
          val means = Array.tabulate(dim)(j =>
            r.getLong(2 + j).toDouble / n.toDouble)
          r.getLong(0) -> means
        }.toMap
      cents = cents.map { case (cid, old) =>
        (cid, stats.getOrElse(cid, old))
      }
      assigned = assign()
    }
    val sizes = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
    assigned.select(col("id"), col("cluster"))
      .withColumn("cluster_n", count(lit(1)).over(sizes))
  }
}
