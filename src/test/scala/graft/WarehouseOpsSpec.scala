package graft

import org.apache.spark.sql.functions._
import org.scalatest.exceptions.TestFailedException

import graft.operators.{Funnel, LangModel, Resample, Upsert, ZOrder}

/** Closed-form checks for the round-7 warehouse/analytics operators:
  * funnel, gap-fill resample, z-order layout, CDC merge, DSIR
  * domain relevance. */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- funnel

  test("funnel: strictly-after prefix semantics, hand-checked") {
    val ev = Seq(
      // u1 completes all three in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: click BEFORE first view → funnel stops at depth 1
      (2L, "click", 5L), (2L, "view", 10L),
      // u3: click at the SAME instant as view → strict > rejects it,
      // but a later click still advances
      (3L, "view", 10L), (3L, "click", 10L), (3L, "click", 40L),
      // u4 never views → not in the output at all
      (4L, "click", 1L), (4L, "purchase", 2L),
      // u5: earliest view is taken, purchase before click ignored
      (5L, "view", 50L), (5L, "view", 5L), (5L, "purchase", 6L),
      (5L, "click", 7L), (5L, "purchase", 8L)
    ).toDF("u", "et", "t")
    val out = Funnel.funnel(ev, "u", "et", "t",
        Seq("view", "click", "purchase"))
      .orderBy("u")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3L),
      (2L, Some(10L), None, None, 1L),
      (3L, Some(10L), Some(40L), None, 2L),
      (5L, Some(5L), Some(7L), Some(8L), 3L)))
  }

  test("funnelCounts matches per-entity depths") {
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L),
      (2L, "a", 1L),
      (3L, "a", 1L), (3L, "b", 2L), (3L, "c", 3L)
    ).toDF("u", "et", "t")
    val counts = Funnel.funnelCounts(ev, "u", "et", "t", Seq("a", "b", "c"))
      .orderBy("step").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(counts.toSeq == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }

  // --------------------------------------------------------- resample

  test("gridInterpolate: exact linear values, event-aligned grid points") {
    // One entity, events at t = 0, 100 (v 0 → 10): grid step 25.
    val ev = Seq((1L, 0L, 0.0), (1L, 100L, 10.0)).toDF("e", "t", "v")
    val out = Resample.gridInterpolate(ev, "e", "t", "v", step = 25L)
      .orderBy("grid_ts").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 0.0), (25L, 2.5), (50L, 5.0),
      (75L, 7.5), (100L, 10.0)))
  }

  test("gridInterpolate: interior grid only, ties keep min value") {
    val ev = Seq(
      (1L, 10L, 4.0), (1L, 10L, 2.0), // duplicate instant → min = 2.0
      (1L, 30L, 6.0),
      (2L, 5L, 1.0), (2L, 9L, 2.0) // span < step → no grid rows
    ).toDF("e", "t", "v")
    val out = Resample.gridInterpolate(ev, "e", "t", "v", step = 10L)
      .orderBy("e", "grid_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // grid for e=1: t = 10, 20, 30; e=2: none (ceil(5/10)=1 > floor(9/10)=0)
    assert(out.toSeq == Seq(
      (1L, 10L, 2.0), (1L, 20L, 4.0), (1L, 30L, 6.0)))
  }

  test("gridInterpolate is partition-independent") {
    val ev = (0L until 400L)
      .map(i => (i % 7, i * 13L, (i % 11).toDouble)).toDF("e", "t", "v")
    val a = Resample.gridInterpolate(ev, "e", "t", "v", step = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Resample.gridInterpolate(ev.repartition(17), "e", "t", "v", 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  // ----------------------------------------------------------- zorder

  test("mortonCode: known values and round-trip inverse") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 9L),
      (1023L, 1023L)).toDF("a", "b")
    val out = df.select(
        ZOrder.mortonCode(col("a"), col("b"), 10).as("z"))
      .withColumn("a2", ZOrder.mortonExtract(col("z"), 0, 10))
      .withColumn("b2", ZOrder.mortonExtract(col("z"), 1, 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val zs = out.map(_._1)
    // interleave(a=1,b=0) = 1; (a=0,b=1) = 2; (3,3) = 15;
    // (5,9): a bits {0,2} → 1+16, b bits {0,3} → 2+128 = 147; 2^20−1 max
    assert(zs.toSeq == Seq(0L, 1L, 2L, 15L, 147L, (1L << 20) - 1))
    // round-trip
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .zip(out).foreach { case ((a, b), (_, a2, b2)) =>
        assert(a == a2 && b == b2)
      }
  }

  test("z-order locality: one zbucket spans a bounded rectangle") {
    // All (a, b) pairs in a 32×32 grid; depth-6 buckets must each
    // cover exactly 2^10/2^6 = 16 cells forming an aligned 4×4 square.
    val pts = for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong)
    val df = ZOrder.withZOrder(pts.toDF("a", "b"), col("a"), col("b"),
      bits = 5, bucketBits = 6)
    val spans = df.groupBy("zbucket").agg(
        count(lit(1)).as("n"),
        (max("a") - min("a")).as("da"), (max("b") - min("b")).as("db"))
      .collect()
    assert(spans.length == 64)
    spans.foreach { r =>
      assert(r.getLong(1) == 16, "16 cells per depth-6 bucket")
      assert(r.getLong(2) == 3 && r.getLong(3) == 3, "4×4 aligned square")
    }
  }

  // ------------------------------------------------------------ merge

  test("upsert: replaces matched keys, appends new ones") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = Upsert.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
  }

  test("merge: applies I/U/D; rejects duplicate keys and bad op codes") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val ch = Seq((2L, "B", "U"), (3L, "x", "D"), (9L, "Z", "I"))
      .toDF("k", "v", "op")
    val out = Upsert.merge(base, ch, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B"), (9L, "Z")))

    val dup = Seq((2L, "B", "U"), (2L, "B2", "U")).toDF("k", "v", "op")
    val e1 = intercept[Exception] {
      Upsert.merge(base, dup, Seq("k")).collect()
    }
    assert(!e1.isInstanceOf[TestFailedException])

    val bad = Seq((2L, "B", "X")).toDF("k", "v", "op")
    val e2 = intercept[Exception] {
      Upsert.merge(base, bad, Seq("k")).collect()
    }
    assert(!e2.isInstanceOf[TestFailedException])
  }

  // ------------------------------------------------------------ audit

  test("audit: one-pass metrics match closed form") {
    val df = Seq(
      (1L, Some("a"), 5.0), (2L, None, -1.0), (3L, Some("a"), 2.0),
      (4L, Some("b"), 0.0)
    ).toDF("id", "cat", "x")
    val out = graft.operators.Audit.audit(df, Seq(
        graft.operators.Audit.rowCount,
        graft.operators.Audit.nullCount("cat"),
        graft.operators.Audit.distinctCount("cat"),
        graft.operators.Audit.violations("nonpos_x", col("x") <= 0)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map(
      "row_count" -> 4L, "null_count:cat" -> 1L,
      "distinct_count:cat" -> 2L, "violations:nonpos_x" -> 2L))
  }

  // ------------------------------------------------------ maintenance

  test("compactFiles: shrinks the file count, preserves every row") {
    val base = tmpDir("graft_compact")
    val df = spark.range(20000).select(col("id"), (col("id") % 97).as("v"))
    df.repartition(40).write.parquet(s"$base/frag")
    val nFrag = new java.io.File(s"$base/frag").list()
      .count(_.endsWith(".parquet"))
    assert(nFrag == 40)
    val nOut = graft.operators.Maintenance.compactFiles(spark,
      s"$base/frag", s"$base/out", targetFileBytes = 1L << 30)
    assert(nOut == 1, s"expected 1 compacted file, got $nOut")
    val a = spark.read.parquet(s"$base/out")
    assert(a.exceptAll(df).isEmpty && df.exceptAll(a).isEmpty)
  }

  test("combineAggregates ≡ full aggregate over the union") {
    val rows = (0L until 1000L).map(i => (i % 37, i * 3 % 101))
    val df = rows.toDF("k", "x")
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(30,8)")).as("s"))
    val merged = graft.operators.Maintenance.combineAggregates(
        agg(df.where(col("x") % 3 =!= 0)), agg(df.where(col("x") % 3 === 0)),
        Seq("k"), Seq("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSet
    val full = agg(df).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDecimal(2).doubleValue)).toSet
    assert(merged == full)
  }

  // ------------------------------------------------- domain relevance

  test("domainRelevance: hand-computed lean decisions") {
    // Target doc: "x x y"; raw doc: "y z z z". Vocab {x,y,z}, V=3,
    // N_t=3, N_r=4.
    //   x: ct=2 cr=0 → 3·7 > 1·6  → lean
    //   y: ct=1 cr=1 → 2·7 > 2·6  → lean
    //   z: ct=0 cr=3 → 1·7 > 4·6 ? 7 > 24 → not lean
    val docs = Seq((1L, "x x y", true), (2L, "y z z z", false))
      .toDF("id", "text", "tgt")
    val out = LangModel.domainRelevance(docs, "id", "text", col("tgt"),
        passFactor = 2L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    // doc1: 3 tokens, all lean (x,x,y) → pass (2·3 ≥ 3)
    // doc2: 4 tokens, lean = {y} → 1 → fail (2·1 < 4)
    assert(out.toSeq == Seq((1L, 3L, 3L, true), (2L, 4L, 1L, false)))
  }

  test("domainRelevance is partition-independent") {
    val docs = (0L until 300L)
      .map(i => (i, s"w${i % 13} w${i % 7} w${i % 3}", i % 5 == 0))
      .toDF("id", "text", "tgt")
    val run = (df: org.apache.spark.sql.DataFrame) =>
      LangModel.domainRelevance(df, "id", "text", col("tgt"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
    assert(run(docs) == run(docs.repartition(19)))
  }

  test("deltaJoin: base⋈base ∪ Δ-terms ≡ full⋈full under arbitrary splits") {
    import spark.implicits._
    // deterministic many-to-many data with several split rules —
    // including empty and full deltas — the identity must hold for all
    val a = (0 until 120).map(i => (i.toLong % 30, i.toLong)).toDF("k", "av")
    val b = (0 until 200).map(i => (i.toLong % 40, 1000L + i)).toDF("k", "bv")
    val full = a.join(b, Seq("k"))
    for (m <- Seq(3L, 7L, 1L, 1000000L)) {
      val (aBase, aDelta) = (a.where(col("av") % m =!= 0), a.where(col("av") % m === 0))
      val (bBase, bDelta) = (b.where(col("bv") % (m + 1) =!= 0), b.where(col("bv") % (m + 1) === 0))
      val maintained = aBase.join(bBase, Seq("k")).unionByName(
        graft.operators.Maintenance.deltaJoin(aBase, aDelta, bBase, bDelta, Seq("k")))
      assert(maintained.count() == full.count(), s"split m=$m count")
      assert(maintained.exceptAll(full).isEmpty &&
        full.exceptAll(maintained).isEmpty, s"split m=$m rows drifted")
    }
  }
}
