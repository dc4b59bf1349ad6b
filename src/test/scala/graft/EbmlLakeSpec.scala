package graft

import graft.operators.EbmlLake
import graft.operators.EbmlLake.{EbmlTrack, Enc}

/** EBML framing: VINT laws, tiling strictness, unknown-element
  * skipping, float widths, fixture replay, fuzz sweeps. */
class EbmlLakeSpec extends SparkSpec {

  private def doc(docType: String = "webm",
      tracks: Seq[EbmlTrack] = Seq(
        EbmlTrack(1, 1, "V_VP9", Some(640), Some(480), None, None)),
      scale: Option[Long] = Some(1000000L),
      duration: Option[Double] = Some(2000.0), durF32: Boolean = false,
      clusters: Seq[Int] = Seq(64), planted: Boolean = false): Array[Byte] =
    EbmlLake.encodeEbml(docType, 4, scale, duration, durF32,
      "mux", tracks, clusters, planted)

  test("round-trip: facts survive the walk exactly") {
    val m = EbmlLake.parseEbml(doc()).get
    assert(m.docType == "webm" && m.docTypeVersion == 4)
    assert(m.timestampScale == 1000000L)
    assert(m.duration.contains(2000.0))
    assert(m.muxingApp == "mux")
    assert(m.tracks.length == 1)
    val t = m.tracks(0)
    assert(t.number == 1 && t.trackType == 1 && t.codecId == "V_VP9")
    assert(t.pixW.contains(640L) && t.pixH.contains(480L))
    assert(m.nClusters == 1)
    // audio track, float32 duration, absent scale (default), planted
    // Void elements at two levels
    val m2 = EbmlLake.parseEbml(doc(docType = "matroska",
      tracks = Seq(
        EbmlTrack(1, 2, "A_OPUS", None, None, Some(2), Some(48000.0)),
        EbmlTrack(2, 1, "V_AV1", Some(320), Some(240), None, None)),
      scale = None, duration = Some(1234.0), durF32 = true,
      clusters = Seq(64, 96), planted = true)).get
    assert(m2.timestampScale == 1000000L, "spec default when absent")
    assert(m2.duration.contains(1234.0), "float32 widens exactly")
    assert(m2.tracks.length == 2 && m2.nClusters == 2)
    assert(m2.tracks(0).channels.contains(2L) &&
      m2.tracks(0).sampleHz.contains(48000.0))
  }

  test("VINT laws: width marker, unknown-size reject, id widths") {
    // a hand-built minimal header with a 2-byte size VINT for a
    // payload that fits 1 byte still parses (VINT widths are the
    // writer's choice) — build by splicing a wider size
    val base = doc()
    // replace the EBML header's size vint (index 4) with the 2-byte
    // form: original is 1 byte 0x80|len
    val hLen = base(4) & 0x7f
    val widened = base.take(4) ++
      Array((0x40).toByte, hLen.toByte) ++ base.drop(5)
    // widening the header size field shifts nothing else: segment
    // still covers the remainder -> must parse identically
    assert(EbmlLake.parseEbml(widened).nonEmpty, "non-minimal size VINT")
    // unknown-size element (all value bits set) rejects
    val unknown = base.take(4) ++ Array(0xff.toByte) ++ base.drop(5)
    assert(EbmlLake.parseEbml(unknown).isEmpty, "unknown-size")
    // id byte 0x00 (width > 8) rejects
    val badId = base.clone(); badId(0) = 0
    assert(EbmlLake.parseEbml(badId).isEmpty)
  }

  test("strictness: tiling and structure lies reject") {
    val good = doc()
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "magic flip" -> mut(c => c(3) = 0x42.toByte),
      "truncated" -> good.dropRight(3),
      "trailing garbage" -> (good ++ Array[Byte](1, 2, 3)))
    cases.foreach { case (name, b) =>
      assert(EbmlLake.parseEbml(b).isEmpty, name)
    }
    assert(EbmlLake.parseEbml(good).nonEmpty, "control")
    assert(EbmlLake.parseEbml(null).isEmpty)
    assert(EbmlLake.parseEbml(Array.emptyByteArray).isEmpty)
    // structural lies, rebuilt
    assert(EbmlLake.parseEbml(doc(docType = "avi")).isEmpty,
      "unknown doctype")
    // a video track with audio facts (mixed planes)
    val mixed = EbmlLake.encodeEbml("webm", 4, Some(1000000L), None,
      durF32 = false, "mux",
      Seq(EbmlTrack(1, 1, "V_VP9", Some(1), Some(1), Some(2),
        Some(48000.0))), Seq(16), planted = false)
    assert(EbmlLake.parseEbml(mixed).isEmpty, "video track + audio plane")
    // no tracks at all
    val noTracks = {
      // drop the Tracks element by building with an empty list is
      // rejected by the encoder path itself (tracks required), so
      // splice: encode with one track, then truncating is covered
      // above; here assert the decoder contract directly on a
      // segment missing Tracks — via a doc whose Tracks id byte is
      // corrupted into an unknown id (same size => skipped => null)
      val b = doc()
      // find the Tracks element id 0x16 0x54 0xae 0x6b
      val i = (0 until b.length - 4).find(k =>
        (b(k) & 0xff) == 0x16 && (b(k + 1) & 0xff) == 0x54 &&
          (b(k + 2) & 0xff) == 0xae && (b(k + 3) & 0xff) == 0x6b).get
      b(i + 1) = 0x55.toByte // still a 4-byte id, now unknown
      b
    }
    assert(EbmlLake.parseEbml(noTracks).isEmpty, "missing Tracks")
  }

  test("integer and float element forms") {
    // multi-byte uints (pix dims >= 256) and 0-valued uints
    val m = EbmlLake.parseEbml(doc(tracks = Seq(
      EbmlTrack(300, 1, "V_VP9", Some(1920), Some(1080), None,
        None)))).get
    assert(m.tracks(0).number == 300 && m.tracks(0).pixW.contains(1920L))
    // float32 vs float64 duration — same integer value, both exact
    val a = EbmlLake.parseEbml(doc(duration = Some(5000.0),
      durF32 = false)).get
    val b = EbmlLake.parseEbml(doc(duration = Some(5000.0),
      durF32 = true)).get
    assert(a.duration == b.duration)
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = Seq(doc(), doc(planted = true, clusters = Seq(64, 96)),
      doc(tracks = Seq(
        EbmlTrack(1, 2, "A_OPUS", None, None, Some(1), Some(48000.0)))))
    for (src <- seeds; i <- src.indices; bit <- Seq(1, 0x40)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      EbmlLake.parseEbml(c).foreach { m =>
        assert(m.tracks.nonEmpty)
      }
    }
    val s0 = seeds.head
    (0 until s0.length).foreach(n => EbmlLake.parseEbml(s0.take(n)))
  }

  test("fixture + catalogEbml: track grain matches the laws") {
    val fx = EbmlLake.ebmlFixture(spark, 12)
    val rows = EbmlLake.catalogEbml(fx, "id", "media")
      .orderBy("id", "track").collect()
    val expect = (0 until 12).map(i => 1 + i % 3).sum
    assert(rows.length == expect)
    assert(rows.forall(_.getBoolean(17)), "all valid")
    // file 0: default-scale path, webm, one video track, 1 cluster
    val f0 = rows.filter(_.getLong(0) == 0L)
    assert(f0.length == 1 && f0(0).getString(1) == "webm")
    assert(f0(0).getLong(3) == 1000000L, "default TimestampScale")
    assert(f0(0).getInt(9) == 1 && f0(0).getString(10) == "V_VP9")
    assert(f0(0).getLong(11) == 320L && f0(0).getLong(12) == 240L)
    assert(f0(0).getInt(15) == 1 && f0(0).getLong(16) == 69L)
    // file 1: matroska, audio first track (i+t odd), 2 clusters
    val f1 = rows.filter(_.getLong(0) == 1L)
    assert(f1.length == 2 && f1(0).getString(1) == "matroska")
    assert(f1(0).getInt(9) == 2 && f1(0).getString(10) == "A_OPUS")
    assert(f1(0).getLong(13) == 2L && f1(0).getDouble(14) == 48000.0)
    assert(f1(0).getLong(16) == 170L)
  }
}
