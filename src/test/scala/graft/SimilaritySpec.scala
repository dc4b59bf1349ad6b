package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine math: orthogonal/parallel sanity") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("q") ->
        (r.getAs[Long]("n"), r.getAs[Double]("cos"))).toMap
    assert(top(0L)._1 == 2L && math.abs(top(0L)._2 - 1.0) < 1e-12,
      "parallel vector wins with cos=1")
    assert(math.abs(top(1L)._2 - 0.0) < 1e-12, "only orthogonal neighbors for q=1")
  }

  test("IVF ANN recall ≥ 0.8 vs brute force on sf0.001 embeddings") {
    // the testdata embeddings are near-random (labels explain <10% of
    // true top-5), so IVF recall ≈ scanned fraction — probe half the
    // lists and expect ~0.84; clustered data (next test) does far
    // better at a far lower scan fraction
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(e, "vec_id", "embedding", 5, nLists = 16, nprobe = 8)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall (|exact|=${exact.size}, |approx|=${approx.size})")
    assert(recall >= 0.8)
  }

  test("IVF ANN recall ≥ 0.95 on clustered vectors at default params") {
    val rnd = new scala.util.Random(5)
    // 20 well-separated centers, 30 points each
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextGaussian() * 10))
    val rows = (0 until 600).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(df, "vec_id", "embedding", 5, nLists = 20, nprobe = 3)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"clustered IVF recall@5 = $recall at scan fraction 3/20")
    assert(recall >= 0.95)
  }

  test("IVF sampling is id-order unbiased: clustered-by-id corpus, recall ≥ 0.9") {
    // adversarial layout: ids are assigned cluster-major (a real
    // corpus sorted by source/time), and the training sample is
    // forced far below the corpus size — a lowest-id prefix sample
    // would train the quantizer on the first few clusters only; the
    // uniform xxhash64 keep-slice must span all of them
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextGaussian() * 10))
    val rows = (0 until 2000).map { i =>
      val c = centers(i / 100) // ids 0-99 cluster 0, 100-199 cluster 1, …
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(df, "vec_id", "embedding", 5,
        nLists = 20, nprobe = 3, sampleSize = 100)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"id-clustered IVF recall@5 = $recall")
    assert(recall >= 0.9)
  }

  test("PQ ANN: recall ≥ 0.8 on clustered vectors, exact on planted twins") {
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextGaussian() * 10))
    val rows = (0 until 600).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(df, df, "vec_id", "embedding", 5, m = 8)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"PQ recall@5 (m=8, 32d -> 8 bytes/vector) = $recall")
    assert(recall >= 0.8)
    // determinism: same seed, same result
    val pq2 = Similarity.pqTopK(df, df, "vec_id", "embedding", 5, m = 8)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq2 == pq)
  }

  test("PQ ANN: LUT-memory batching (forced multi-batch) equals one-batch run") {
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian() * 10))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val one = Similarity.pqTopK(df, df, "vec_id", "embedding", 3, m = 8)
      .orderBy("q", "rank").collect().map(_.toSeq)
    // m=8, nCents<=75 for a 300-row corpus sample; 8*75*8 = 4800 B per
    // query -> maxLutBytes=20000 forces ~75 batches over 300 queries
    val batched = Similarity.pqTopK(df, df, "vec_id", "embedding", 3, m = 8,
      maxLutBytes = 20000)
      .orderBy("q", "rank").collect().map(_.toSeq)
    assert(batched.toSeq == one.toSeq)
  }

  test("ivfTopKCross with exhaustive probe equals brute force on the query subset") {
    val d = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = d.where(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(q, d, "vec_id", "embedding", 5)
      .select("q", "rank", "n").orderBy("q", "rank").collect().map(_.toSeq)
    val probed = Similarity.ivfTopKCross(q, d, "vec_id", "embedding", 5,
      nLists = 8, nprobe = 8)
      .select("q", "rank", "n").orderBy("q", "rank").collect().map(_.toSeq)
    assert(probed.toSeq == exact.toSeq)
  }

  test("lshTopKCross equals lshTopK restricted to the query subset") {
    val d = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = d.where(col("vec_id") % 7 === 0)
    val self = Similarity.lshTopK(d, "vec_id", "embedding", 3)
      .where(col("q") % 7 === 0)
      .orderBy("q", "rank").collect().map(_.toSeq)
    val cross = Similarity.lshTopKCross(q, d, "vec_id", "embedding", 3)
      .orderBy("q", "rank").collect().map(_.toSeq)
    assert(cross.toSeq == self.toSeq)
    assert(cross.nonEmpty)
  }

  test("bruteForceTopK: broadcast size guard fails fast") {
    val df = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 1,
        maxBroadcastBytes = 16)
    }
    assert(e.getMessage.contains("ivfTopK"))
  }

  test("hyperplane LSH recall ≥ 0.9 in its regime (high-similarity near-dups)") {
    // pairs of near-identical vectors (cos ≈ 0.99) + random background
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val rows = (0 until 100).flatMap { i =>
      val v = vec()
      val dup = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Seq((2L * i, v), (2L * i + 1, dup))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val found = Similarity.lshTopK(df, "vec_id", "embedding", 1, tables = 8, bits = 12)
      .where(col("rank") === 1).collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("n"))).toSet
    // each vector's true top-1 is its planted twin
    val hits = (0 until 200).count { i =>
      val twin = if (i % 2 == 0) i + 1 else i - 1
      found.contains((i.toLong, twin.toLong))
    }
    info(s"LSH twin recall = ${hits / 200.0}")
    assert(hits >= 180)
  }

  test("cosine near-dup: recovers exactly the planted twin pairs") {
    import org.apache.spark.sql.functions.{col => c, lit, transform, when}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val twins = e.select((c("vec_id") + lit(1000000L)).as("vec_id"),
      transform(c("embedding"),
        (x, i) => x + when(i === 0, lit(0.05f)).otherwise(lit(0.0f))).as("embedding"))
    val pairs = Similarity.cosineNearDup(
        e.select("vec_id", "embedding").union(twins), "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val n = e.count()
    val expected = (0L until n).map(i => (i, i + 1000000L)).toSet
    assert(pairs == expected, s"got ${pairs.size} pairs, want $n twins")
  }

  test("cosineNearDupCross + decontaminateEmbedding: twin eval pairs found, leaked rows dropped") {
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val corpus = (0L until 30L).map(i => (i, vec())).toDF("vec_id", "embedding")
    // eval = near-copies of corpus rows 0 and 7 (tiny perturbation →
    // cos ≈ 1) plus one independent vector
    val base = corpus.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val eval = Seq(
      (100L, base(0L).map(x => x + 0.01f)),
      (107L, base(7L).map(x => x + 0.01f)),
      (199L, vec())).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupCross(
      corpus, eval, "vec_id", "embedding", threshold = 0.98)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 100L), (7L, 107L)))
    val kept = Similarity.decontaminateEmbedding(
      corpus, eval, "vec_id", "embedding", threshold = 0.98)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 30L).toSet -- Set(0L, 7L))
  }

  test("distributed quantizer: lloydDecimal is bit-exact vs local reference, partition-independent") {
    val rnd = new scala.util.Random(3)
    val data = (0L until 400L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian()))).toSeq
    val df = data.toDF("id", "v")
    val init = Similarity.hashInit(df, 16, seed = 9L)
    assert(init.length == 16)
    val local = Similarity.lloydDecimalLocal(
      data.map(_._2).toArray, init, iters = 3)
    val dist7 = Similarity.lloydDecimal(df.repartition(7), init, iters = 3)
    val dist3 = Similarity.lloydDecimal(df.repartition(3), init, iters = 3)
    // decimal-exact sums ⇒ the distributed result is BIT-identical to
    // the sequential reference, at any partition count
    assert(dist7.map(_.toSeq).toSeq == local.map(_.toSeq).toSeq)
    assert(dist3.map(_.toSeq).toSeq == local.map(_.toSeq).toSeq)
  }

  test("distributed quantizer: trains nLists=4096 without driver materialization") {
    val rnd = new scala.util.Random(17)
    val df = (0L until 20000L).map(i =>
      (i, Array.fill(4)(rnd.nextGaussian()))).toSeq.toDF("id", "v")
    val a = Similarity.trainCentroidsDistributed(
      df.repartition(5), 4096, iters = 2, seed = 1L)
    val b = Similarity.trainCentroidsDistributed(
      df.repartition(13), 4096, iters = 2, seed = 1L)
    assert(a.length == 4096)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "centroids must not depend on partitioning")
  }

  test("IVF distributed-trainer path: partial-probe recall on clustered vectors") {
    // 40 well-separated centers x 60 points at dim 16; nLists = 600
    // forces the distributed trainer, nprobe = 60 scans 10% of lists —
    // recall must come from centroid quality, not exhaustiveness
    val rnd = new scala.util.Random(29)
    val centers = Array.fill(40, 16)(rnd.nextGaussian() * 10)
    val pts = (0 until 2400).map { i =>
      val c = centers(i % 40)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(df, "vec_id", "embedding", 5,
        nLists = 600, nprobe = 60)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"distributed-path IVF recall@5 = $recall")
    assert(recall >= 0.9)
  }

  test("IVF with nLists > 512 (distributed trainer path) matches brute force under exhaustive probe") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDist = Similarity.ivfTopK(e, "vec_id", "embedding", 5,
        nLists = 600, nprobe = 600)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDist == exact)
  }

  test("ivfpqTopKCross with exhaustive probe equals brute force on the query subset") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = e.where(col("vec_id") % 7 === 0)
    val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = Similarity.ivfpqTopKCross(qs, e, "vec_id", "embedding", 5,
        nLists = 8, nprobe = 8, m = 8, rerank = 40)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == exact)
  }

  test("subspace codebooks train distributed above the driver cap: " +
      "partition-independent, exhaustive-probe exact") {
    // sampleSize 100 000 > DriverTrainCap forces the distributed
    // subspace trainer in both PQ paths (on 500 rows, step=1: the
    // whole corpus is the training set, never collected)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = e.where(col("vec_id") % 7 === 0)
    def runPq(parts: Int) = Similarity.pqTopK(qs, e.repartition(parts),
        "vec_id", "embedding", 5, m = 8, rerank = 40, sampleSize = 100000)
      .orderBy("q", "rank").collect().map(_.toString).toSeq
    assert(runPq(3) == runPq(11),
      "distributed-trained PQ must not depend on partitioning")
    val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = Similarity.ivfpqTopKCross(qs, e, "vec_id", "embedding", 5,
        nLists = 8, nprobe = 8, m = 8, rerank = 40, sampleSize = 100000)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == exact,
      "exhaustive probe + rerank over distributed-trained codebooks")
  }

  test("ivfpqTopKCross is invariant to the list sub-block size") {
    // maxBlockRows=7 forces every list into many hash sub-blocks
    // (500/16 lists ≈ 31 rows each → ~5 blocks per list); the full
    // (q, rank, n, cos) output must be bit-identical to the default
    // single-block-per-list layout — each list's codes are scanned
    // exactly once across its blocks and the unioned per-block top-k
    // survivors merge to the same global top-k
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = e.where(col("vec_id") % 7 === 0)
    def run(blk: Int) = Similarity.ivfpqTopKCross(qs, e, "vec_id",
        "embedding", 5, nLists = 16, nprobe = 4, m = 8, rerank = 8,
        maxBlockRows = blk)
      .orderBy("q", "rank").collect().map(_.toString).toSeq
    assert(run(7) == run(1 << 16))
  }

  test("IVF-PQ: partial-probe recall on clustered vectors") {
    // same clustered regime as the IVF tests: 20 centers x 30 points,
    // nLists=20, probe 25% — residual-PQ ADC + rerank must recover
    // most true neighbors from a quarter of the lists
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(20, 32)(rnd.nextGaussian() * 8)
    val pts = (0 until 600).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.4).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 5)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfpqTopK(df, "vec_id", "embedding", 5,
        nLists = 20, nprobe = 5, m = 8, rerank = 8)
      .select("q", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF-PQ recall@5 = $recall")
    assert(recall >= 0.85)
  }

  test("LSH buckets are deterministic across invocations") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b1 = Similarity.buckets(e, "vec_id", "embedding").orderBy("id", "table").collect()
    val b2 = Similarity.buckets(e, "vec_id", "embedding").orderBy("id", "table").collect()
    assert(b1.map(_.toSeq).toSeq == b2.map(_.toSeq).toSeq)
  }

  test("dedupSemantic: transitive chains cluster, keeps min id, covers all rows") {
    // 2-D chain at 15° steps: adjacent pairs cos(15°)≈0.966 ≥ 0.95,
    // ends cos(30°)≈0.866 < 0.95 — the cluster must still be ONE
    // component via transitivity. Vector 10 is near-orthogonal.
    def rot(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val df = Seq(
      (3L, rot(0)), (1L, rot(15)), (2L, rot(30)),
      (10L, rot(100))).toDF("vec_id", "embedding")
    val out = Similarity.dedupSemantic(df, "vec_id", "embedding",
      threshold = 0.95, tables = 32, bits = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (10L, 10L, true)),
      s"got ${out.toSeq}")
  }

  test("seedAssign: closed-form clusters, ties to lowest seed, partition-independent") {
    // Seeds are ids 0 and 1 (k=2). id 2 sits nearer seed 1; id 3 is
    // EXACTLY equidistant → tie goes to the lower seed id (0).
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(4f, 0f)),
      (2L, Array(3f, 0f)), (3L, Array(2f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.seedAssign(df, "vec_id", "embedding", k = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 2L), (1L, 1L, 2L),
      (2L, 1L, 2L), (3L, 0L, 2L)))
    val repart = Similarity.seedAssign(df.repartition(7), "vec_id",
        "embedding", k = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(repart.toSeq == out.toSeq)
  }

  test("mmrSelect: closed-form pick order and diversity behavior") {
    // 3-D so diversity can exist off the relevance axis (on a 2-D arc
    // every relevant vector is also similar to every other): 1 and 3
    // are equally relevant in ORTHOGONAL planes (exact rel tie → id 1
    // first); 2 is slightly less relevant but nearly a duplicate of
    // 1, so the diversity penalty must rank 3 above 2.
    val df = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.436f, 0f)),
      (2L, Array(0.89f, 0.456f, 0f)),
      (3L, Array(0.9f, 0f, 0.436f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(df, "vec_id", "embedding",
        queryId = 0L, k = 3, poolSize = 3, lambda = 0.5, mu = 0.5)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 3L), (3L, 2L)), s"got ${out.toSeq}")
  }

  test("q89 greedy margins tolerate cross-engine ulp noise (sf0.01 + sf0.1)") {
    // Replay q89's pool + greedy in plain Scala and assert each
    // decision (pool cut at 20, every argmax step) is separated by
    // >1e-9 relative — sub-ulp cosine disagreement cannot change the
    // oracle's picks.
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val rows = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val qv = rows.find(_._1 == 0L).get._2
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val rel = rows.filter(_._1 != 0L)
        .map { case (id, v) => (id, v, cos(v, qv)) }
        .sortBy(t => (-t._3, t._1))
      val cut = (rel(19)._3 - rel(20)._3) / math.max(math.abs(rel(19)._3), 1e-300)
      assert(cut > 1e-9, s"$dir pool-boundary margin $cut")
      var pool = rel.take(20).toBuffer
      var selected = List.empty[(Long, Array[Double])]
      (1 to 5).foreach { _ =>
        val scored = pool.map { case (id, v, r) =>
          val ms = if (selected.isEmpty) 0.0
            else selected.map(s => cos(v, s._2)).max
          (id, v, 0.7 * r - 0.3 * ms)
        }.sortBy(t => (-t._3, t._1))
        val margin = (scored(0)._3 - scored(1)._3) /
          math.max(math.abs(scored(0)._3), 1e-300)
        assert(margin > 1e-9, s"$dir greedy step margin $margin")
        selected ::= ((scored(0)._1, scored(0)._2))
        pool = pool.filterNot(_._1 == scored(0)._1)
      }
    }
  }

  test("q84 argmin margins tolerate cross-engine ulp noise (sf0.01 + sf0.1)") {
    // The oracle recomputes distances with its own fold; a sub-ulp
    // disagreement only matters if some vector's best two seeds are
    // nearly equidistant. Gate: relative margin > 1e-9 everywhere.
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      val seeds = vecs.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val dists = seeds.toIndexedSeq.map { case (_, s) =>
        s.indices.map { i =>
          val d = element_at(col("embedding"), i + 1).cast("double") - lit(s(i))
          d * d
        }.reduce(_ + _)
      }
      val sorted = array_sort(array(dists: _*))
      val margin = vecs.select(
          ((element_at(sorted, 2) - element_at(sorted, 1)) /
            greatest(element_at(sorted, 1), lit(1e-300))).as("m"))
        .agg(min(col("m"))).collect()(0).getDouble(0)
      assert(margin > 1e-9, s"$dir min relative margin $margin")
    }
  }

  /** Local reference for lloydKMeans: the same quantized loop in
    * plain Scala — rint (≡ bround at scale 0: ties-to-even on the
    * exact double value) quantization, integer sums + one division
    * per mean, DIRECT-formula distances (the oracle's op order),
    * (dist, cid) argmin, emptied clusters keep their centroid. */
  private def localLloyd(vecs: Seq[(Long, Array[Float])], k: Int,
                         rounds: Int): Seq[(Long, Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.rint(x.toDouble * 1e6).toLong))
    }
    val dim = q.head._2.length
    var cents = q.sortBy(_._1).take(k)
      .map { case (id, qv) => (id, qv.map(_.toDouble)) }
    def assignLocal(): Map[Long, Long] = q.map { case (id, qv) =>
      val best = cents.map { case (cid, m) =>
        (qv.indices.foldLeft(0.0)((s, j) =>
          s + (qv(j) - m(j)) * (qv(j) - m(j))), cid)
      }.minBy(identity)
      id -> best._2
    }.toMap
    var a = assignLocal()
    for (_ <- 1 until rounds) {
      val groups = q.groupBy { case (id, _) => a(id) }
      cents = cents.map { case (cid, old) =>
        groups.get(cid) match {
          case Some(rows) =>
            val n = rows.size.toDouble
            (cid, Array.tabulate(dim)(j =>
              rows.map(_._2(j)).sum.toDouble / n))
          case None => (cid, old)
        }
      }
      a = assignLocal()
    }
    val sizes = a.values.groupBy(identity)
      .map { case (c, xs) => (c, xs.size.toLong) }
    vecs.map(_._1).sorted.map(id => (id, a(id), sizes(a(id))))
  }

  test("lloydKMeans: matches a local reference loop, partition-independent") {
    // deterministic pseudo-random fixture (24 vectors, 3-D)
    val vecs = (0 until 24).map { i =>
      val v = Array.tabulate(3)(j =>
        (((i * 31 + j * 17) % 19) - 9) / 10.0f)
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.lloydKMeans(df, "vec_id", "embedding",
        k = 4, rounds = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = localLloyd(vecs, k = 4, rounds = 3)
    assert(out.toSeq == want, s"engine ${out.toSeq}\nlocal $want")
    val repart = Similarity.lloydKMeans(df.repartition(7), "vec_id",
        "embedding", k = 4, rounds = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(repart.toSeq == out.toSeq)
  }

  test("lloydKMeans: empty-cluster round keeps the centroid (duplicate seeds)") {
    // seeds are ids 0,1,2 and the vectors of 1 and 2 are IDENTICAL:
    // round 1 ties every point to the lower cluster id, so cluster 2
    // EMPTIES; its retained centroid then sits exactly on the
    // duplicate points, which flow back once cluster 1's mean is
    // pulled away by id 4 — the reference loop models the same
    // retention rule, so equivalence exercises the empty-then-refill
    // path end to end (plus rerun determinism).
    val vecs = Seq(
      (0L, Array(0f)), (1L, Array(0.00001f)), (2L, Array(0.00001f)),
      (3L, Array(0.000001f)), (4L, Array(0.000009f)))
    val df = vecs.toDF("vec_id", "embedding")
    def run() = Similarity.lloydKMeans(df, "vec_id", "embedding",
        k = 3, rounds = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run()
    assert(out.toSeq == localLloyd(vecs, k = 3, rounds = 3),
      s"got ${out.toSeq}")
    assert(run().toSeq == out.toSeq)
  }

  test("q98 per-round argmin margins tolerate cross-engine ulp noise (sf0.01 + sf0.1)") {
    // The engine's expansion (x·x − 2x·m + ‖m‖²) reorders float ops
    // vs the oracle's direct Σ(x−m)²; both decisions agree as long as
    // every vector's best two centroids are separated — gate every
    // ROUND's argmin at >1e-9 relative margin. The loop below is the
    // exact integer-sum reference (bit-identical centroids to both
    // engines by construction), distances in the oracle's direct form.
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val q = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            e => bround(e * lit(1000000.0)).cast("long")).as("qv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      val dim = q.head._2.length
      var cents = q.sortBy(_._1).take(8)
        .map { case (id, qv) => (id, qv.map(_.toDouble)) }
      var minMargin = Double.MaxValue
      var a = Map.empty[Long, Long]
      for (round <- 1 to 3) {
        val asg = q.map { case (id, qv) =>
          val ds = cents.map { case (cid, m) =>
            (qv.indices.foldLeft(0.0)((s, j) =>
              s + (qv(j) - m(j)) * (qv(j) - m(j))), cid)
          }.sortBy(identity)
          val m = (ds(1)._1 - ds(0)._1) / math.max(ds(0)._1, 1e-300)
          minMargin = math.min(minMargin, m)
          id -> ds(0)._2
        }
        a = asg.toMap
        if (round < 3) {
          val groups = q.groupBy { case (id, _) => a(id) }
          cents = cents.map { case (cid, old) =>
            groups.get(cid) match {
              case Some(rows) =>
                val n = rows.size.toDouble
                (cid, Array.tabulate(dim)(j =>
                  rows.map(_._2(j)).sum.toDouble / n))
              case None => (cid, old)
            }
          }
        }
      }
      assert(minMargin > 1e-9, s"$dir min per-round relative margin $minMargin")
    }
  }
}
