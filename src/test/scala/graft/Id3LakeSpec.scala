package graft

import graft.operators.{Id3Lake, Multimodal}

/** ID3v2 walk: versioned size law, encoding matrix, strictness,
  * fixture-law equality, byte-flip sweep. */
class Id3LakeSpec extends SparkSpec {

  private def blob(i: Int): Array[Byte] =
    Id3Lake.taggedMp3Fixture(spark, i + 1).collect().last.getAs[Array[Byte]](1)

  test("fixture laws: extract output matches the closed forms") {
    val out = Id3Lake.extractTagged(
      Id3Lake.taggedMp3Fixture(spark, 12), "id", "media")
      .orderBy("id").collect()
    assert(out.forall(_.getBoolean(13)))
    assert(out.length == 12)
    out.foreach { r =>
      val i = r.getLong(0)
      assert(r.getInt(1) == (if (i % 2 == 0) 3 else 4))
      assert(r.getString(2) == s"Song $i ü${(i * 3) % 10}")
      assert(r.getString(3) == s"Artist ${i % 7}")
      assert(r.getInt(5) == 1990 + i % 30)
      assert(r.getInt(6) == 1 + i % 12)
      assert(r.getString(7) == s"Genre${i % 4}")
      assert(r.getInt(8) == 6 && r.getInt(9) == i % 64)
      assert(r.getInt(10) == Seq(44100, 48000, 32000)((i % 3).toInt))
      assert(r.getInt(12) == 10 + i % 30)
    }
  }

  test("strictness matrix: every tag lie rejects") {
    // v2.3 file with zero padding (id 2: pad=2 → use id 0, pad=0)
    val g3 = blob(0) // v2.3
    val g4 = blob(1) // v2.4
    def mut(src: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = src.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "version 2.2" -> mut(g3)(_(3) = 2),
      "nonzero revision" -> mut(g3)(_(4) = 1),
      "unsynchronisation flag" -> mut(g3)(_(5) = 0x80.toByte),
      "extended-header flag" -> mut(g4)(_(5) = 0x40.toByte),
      "non-syncsafe tag size" -> mut(g3)(_(6) = 0x80.toByte),
      "nonzero frame flag" -> mut(g3)(_(18) = 1), // TIT2 flags at 10+8
      "lowercase frame id" -> mut(g3)(_(10) = 't'),
      "truncated tag" -> g3.take(20),
      "tag without audio" -> {
        // recompute: header+body only (strip the MP3 stream)
        val size = ((g3(6) & 0x7f) << 21) | ((g3(7) & 0x7f) << 14) |
          ((g3(8) & 0x7f) << 7) | (g3(9) & 0x7f)
        g3.take(10 + size)
      })
    cases.foreach { case (name, b) =>
      assert(Id3Lake.parseTagged(b).isEmpty, name)
    }
    assert(Id3Lake.parseTagged(null).isEmpty)
    assert(Id3Lake.parseTagged("ID3".getBytes("ISO-8859-1")).isEmpty)
    // untagged audio is not this operator's shape
    assert(Id3Lake.parseTagged(Multimodal.encodeMp3(2, 0, 5)).isEmpty)
  }

  test("frame-level strictness via hand-built tags") {
    def tag(ver: Int, frames: Array[Byte], audioFrames: Int = 4): Array[Byte] = {
      val ss = Array(((frames.length >> 21) & 0x7f).toByte,
        ((frames.length >> 14) & 0x7f).toByte,
        ((frames.length >> 7) & 0x7f).toByte, (frames.length & 0x7f).toByte)
      "ID3".getBytes("ISO-8859-1") ++ Array(ver.toByte, 0.toByte, 0.toByte) ++
        ss ++ frames ++ Multimodal.encodeMp3(2, 0, audioFrames)
    }
    val ok = Id3Lake.encFrame(3, "TIT2", 0, "t", trailingNul = false)
    assert(Id3Lake.parseTagged(tag(3, ok)).nonEmpty)

    val cases: Seq[(String, Array[Byte])] = Seq(
      "duplicate frame" -> (ok ++ ok),
      "TXXX out of subset" ->
        Id3Lake.encFrame(3, "TXXX", 0, "k", trailingNul = false),
      "non-text frame id" ->
        Id3Lake.encFrame(3, "APIC", 0, "x", trailingNul = false),
      "utf-8 in a v2.3 tag" ->
        Id3Lake.encFrame(3, "TIT2", 3, "x", trailingNul = false),
      "v2.4 year frame in v2.3" ->
        Id3Lake.encFrame(3, "TDRC", 0, "1999", trailingNul = false),
      "five-digit year" ->
        Id3Lake.encFrame(3, "TYER", 0, "19999", trailingNul = false),
      "non-numeric track" ->
        Id3Lake.encFrame(3, "TRCK", 0, "one", trailingNul = false),
      "embedded NUL (multi-value)" ->
        Id3Lake.encFrame(3, "TIT2", 0, "a\u0000b", trailingNul = false),
      "dirty padding" -> (ok ++ Array[Byte](0, 0, 7)))
    cases.foreach { case (name, frames) =>
      assert(Id3Lake.parseTagged(tag(3, frames)).isEmpty, name)
    }
    // v2.4 size law: a plain-BE size whose bytes are NOT syncsafe
    // must reject in a v2.4 tag even though v2.3 would accept it
    val bigPayload = "x" * 200
    val v3Frame = Id3Lake.encFrame(3, "TIT2", 0, bigPayload, trailingNul = false)
    assert(Id3Lake.parseTagged(tag(3, v3Frame)).nonEmpty)
    val v4WithPlainSize = {
      val c = v3Frame.clone() // 201-byte payload → size byte 0xC9 > 0x7F
      assert((c(7) & 0xff) == 201)
      c
    }
    assert(Id3Lake.parseTagged(tag(4, v4WithPlainSize)).isEmpty,
      "v2.4 must read syncsafe frame sizes")
  }

  test("byte-flip sweep never throws") {
    val seeds = Id3Lake.taggedMp3Fixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      Id3Lake.parseTagged(c) // must not throw
    }
  }
}
