package graft

import graft.operators.Multimodal

/** Audio energy segmentation (q191): law replay, the threshold
  * boundary, 8-bit widening, the full-frames-only contract, silent
  * streams, and junk strictness. */
class EnergySegmentsSpec extends SparkSpec {

  test("fixture segments match the independent gaps-and-islands replay") {
    val n = 12
    val frameLen = 64
    val got = Multimodal.energySegments(
        Multimodal.energyFixture(spark, n, frameLen),
        "id", "media", frameLen, 90000L)
      .orderBy("id", "seg").collect()
    var idx = 0
    for (r <- 0 until n) {
      val ch = 1 + r % 2
      val nf = 20 + r % 10
      val frames = (0 until nf).map { j =>
        val a = ((r + 3 * j) % 5) * 300L
        (j, a >= 300, frameLen.toLong * ch * a * a)
      }
      // reference merge
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
      var start = -1; var esum = 0L
      frames.foreach { case (j, active, e) =>
        if (active) { if (start < 0) { start = j; esum = 0 }; esum += e }
        else if (start >= 0) { segs += ((start, j - start, esum)); start = -1 }
      }
      if (start >= 0) segs += ((start, nf - start, esum))
      segs.zipWithIndex.foreach { case ((st, len, es), k) =>
        val row = got(idx); idx += 1
        assert(row.getAs[Long]("id") == r && row.getAs[Int]("seg") == k)
        assert(row.getAs[Long]("start_frame") == st, s"id $r seg $k")
        assert(row.getAs[Long]("seg_frames") == len, s"id $r seg $k")
        assert(row.getAs[Long]("energy_sum") == es, s"id $r seg $k")
        assert(row.getAs[Long]("n_frames") == nf)
      }
    }
    assert(idx == got.length)
  }

  test("threshold boundary: mean energy == threshold is active, one less is not") {
    // single frame of constant amplitude: mean per-sample energy a²
    def wav(a: Int) = Multimodal.encodeWav(8000, 1,
      Array.fill(64)(a.toShort))
    val at = Multimodal.parseEnergySegments(wav(300), 64, 90000L).get
    assert(at._4.length == 1 && at._4.head.energySum == 64L * 300 * 300)
    val below = Multimodal.parseEnergySegments(wav(299), 64, 90000L).get
    assert(below._4.isEmpty)
  }

  test("8-bit PCM widens (u-128)*256 so one threshold serves both widths") {
    // hand-built 8-bit mono WAV: 64 samples at u=130 -> s = 512,
    // mean energy 512² = 262144 >= 90000 -> one active frame
    val dataLen = 64
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("ASCII")).putInt(dataLen)
    (0 until dataLen).foreach(_ => bb.put(130.toByte))
    val out = Multimodal.parseEnergySegments(bb.array(), 64, 90000L).get
    assert(out._4.length == 1 &&
      out._4.head.energySum == 64L * 512 * 512)
    // u=128 is digital silence exactly
    val silent = bb.array().clone()
    (44 until 44 + dataLen).foreach(i => silent(i) = 128.toByte)
    assert(Multimodal.parseEnergySegments(silent, 64, 90000L).get._4.isEmpty)
  }

  test("only full frames classify: a loud partial tail never leaks") {
    // 64 quiet samples (one silent frame) + 63 loud tail samples:
    // no segment at all, even though the tail alone is way over
    val samples = Array.fill(64)(0.toShort) ++ Array.fill(63)(30000.toShort)
    val segs = Multimodal.parseEnergySegments(
      Multimodal.encodeWav(8000, 1, samples), 64, 90000L).get
    assert(segs._3 == 1L && segs._4.isEmpty)
    // one more sample completes the loud frame -> one segment
    val full = samples :+ 30000.toShort
    val segs2 = Multimodal.parseEnergySegments(
      Multimodal.encodeWav(8000, 1, full), 64, 90000L).get
    assert(segs2._3 == 2L && segs2._4.length == 1 &&
      segs2._4.head.startFrame == 1L)
  }

  test("junk flags invalid; a valid silent stream yields zero segment rows") {
    import spark.implicits._
    val junk = Array.tabulate[Byte](200)(i => (i * 41).toByte)
    val silentWav = Multimodal.encodeWav(8000, 2, new Array[Short](256))
    val out = Multimodal.energySegments(
        Seq((0L, junk), (1L, silentWav)).toDF("id", "media"),
        "id", "media", 64, 90000L)
      .orderBy("id").collect()
    assert(out.length == 1 && out(0).getLong(0) == 0L &&
      !out(0).getAs[Boolean]("valid"))
  }
}
