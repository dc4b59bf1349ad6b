package graft

import graft.operators.Multimodal

/** Layer III SHORT blocks (q197): fixture round-trip sanity plus the
  * strictness matrix for everything the short path rejects rather
  * than guesses. Splice offsets assume the unprotected mono layout:
  * side info at file byte 4; granule 0's window-switching fields
  * start at side-info bit 51 (after mdb 9 + private 5 + scfsi 4 +
  * p23 12 + bv 9 + gg 8 + scomp 4). */
class Mp3L3ShortSpec extends SparkSpec {

  private def fix(r: Int): Array[Byte] =
    Multimodal.mp3L3ShortFixture(spark, r + 1).orderBy("id").collect()(r)
      .getAs[Array[Byte]]("media")

  test("short fixture streams decode; frame/sample accounting holds") {
    val got = Multimodal.decodeMp3L3(
        Multimodal.mp3L3ShortFixture(spark, 6), "id", "media")
      .orderBy("id").collect()
    for (r <- 0 until 6) {
      val ch = if ((r / 3) % 3 == 0) 1 else 2
      val nf = 2 + r % 3
      assert(got(r).getAs[Boolean]("valid"), s"id $r")
      // exactly one short granule per (frame, channel), 78 slots each
      assert(got(r).getAs[Long]("n_decoded") == nf.toLong * ch * 78)
      assert(got(r).getAs[Long]("total_samples") == nf.toLong * 1152 * ch)
    }
  }

  test("strictness: illegal window-switching shapes, scfsi/preflag with bt2") {
    // id 1: mono, unprotected, granule 0 of frame 0 is SHORT
    val good = fix(1)
    assert(Multimodal.parseMp3L3(good).isDefined)
    assert((good(1) & 1) == 1 && ((good(3) & 0xff) >> 6) == 3)
    // block_type bits 52-53 currently 10 (short); splice 00 —
    // block_type 0 with window_switching_flag set is illegal
    val bt0 = good.clone()
    bt0(10) = (bt0(10) & ~0x0c).toByte
    assert(Multimodal.parseMp3L3(bt0).isEmpty)
    // block_type 01 with mixed_block_flag (bit 54) set: mixed is
    // defined for block_type 2 only
    val bt1mixed = good.clone()
    bt1mixed(10) = (((bt1mixed(10) & ~0x08) | 0x04) | 0x02).toByte
    assert(Multimodal.parseMp3L3(bt1mixed).isEmpty)
    // scfsi nibble nonzero while a granule is short (bit 14 — byte 5)
    val scfsi = good.clone()
    scfsi(5) = (scfsi(5) | 0x02).toByte
    assert(Multimodal.parseMp3L3(scfsi).isEmpty)
    // preflag with a short granule (granule-0 bit 74 — byte 13)
    val pf = good.clone()
    pf(13) = (pf(13) | 0x20).toByte
    assert(Multimodal.parseMp3L3(pf).isEmpty)
    // joint stereo on a stereo stream — id 5 is stereo ((5/3)%3 != 0)
    // and odd, so UNPROTECTED (no CRC over the spliced header byte);
    // byte 3's top nibble carries mode(2) + mode_extension(2). Since
    // round 15 ALL mode_extensions parse (the Layer III stereo tools
    // never change bitstream syntax — q219) and the per-tool frame
    // counters split the extension bits
    val st = fix(5)
    assert(((st(3) & 0xff) >> 6) == 0 && Multimodal.parseMp3L3(st).isDefined)
    val intensity = st.clone()
    intensity(3) = ((intensity(3) & 0x0f) | 0x50).toByte // mode 01, ext 01
    assert(Multimodal.parseMp3L3(intensity)
      .exists(d => d.isFrames == 1 && d.msFrames == 0))
    // MS-only joint stereo (ext 10) on the same bytes likewise PARSES
    // (same side-info/main-data layout, only the header mode differs)
    val ms = st.clone()
    ms(3) = ((ms(3) & 0x0f) | 0x60).toByte // mode 01, ext 10
    assert(Multimodal.parseMp3L3(ms)
      .exists(d => d.msFrames == 1 && d.isFrames == 0))
    // both tools at once (ext 11)
    val both = st.clone()
    both(3) = ((both(3) & 0x0f) | 0x70).toByte // mode 01, ext 11
    assert(Multimodal.parseMp3L3(both)
      .exists(d => d.msFrames == 1 && d.isFrames == 1))
    // the long-block property/fixture families still decode (no
    // regression from the window-switching branch)
    assert(Multimodal.parseMp3L3(
      Multimodal.mp3L3Fixture(spark, 2).orderBy("id").collect()(1)
        .getAs[Array[Byte]]("media")).isDefined)
  }

  test("encoder refuses what the decoder rejects") {
    def spec(bt: Int, pf: Int, mixed: Boolean = false) =
      Multimodal.Mp3GrSpec(
        210, 0, pf, 0, 0, (1, 1, 0), 0, 0, 0, _ => 0, _ => 0, 0,
        blockType = bt, mixedBlock = mixed)
    intercept[IllegalArgumentException] { // mixed with bt 1
      Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
        _ => 0, _ => 0, (_, _) => 0, (_, _, _) => spec(1, 0, mixed = true))
    }
    intercept[IllegalArgumentException] { // preflag with bt 2
      Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
        _ => 0, _ => 0, (_, _) => 0, (_, _, _) => spec(2, 1))
    }
    intercept[IllegalArgumentException] { // scfsi nonzero with short
      Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
        _ => 0, _ => 0, (_, _) => 5, (_, _, _) => spec(2, 0))
    }
    intercept[IllegalArgumentException] { // mode/mono mismatch
      Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
        _ => 0, _ => 0, (_, _) => 0, (_, _, _) => spec(0, 0), mode = 1)
    }
    // bt 1/3 long transition granules are now encodable (q200)
    assert(Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
      _ => 0, _ => 0, (_, _) => 0, (_, _, _) => spec(1, 0)).nonEmpty)
  }
}
