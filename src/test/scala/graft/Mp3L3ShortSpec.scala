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

  test("strictness: block types 1/3, mixed blocks, scfsi and preflag with short") {
    // id 1: mono, unprotected, granule 0 of frame 0 is SHORT
    val good = fix(1)
    assert(Multimodal.parseMp3L3(good).isDefined)
    assert((good(1) & 1) == 1 && ((good(3) & 0xff) >> 6) == 3)
    // block_type bits 52-53 currently 10 (short); splice 01 (bt 1 —
    // long-window transition frame, spectral layout out of scope)
    val bt1 = good.clone()
    bt1(10) = ((bt1(10) & ~0x08) | 0x04).toByte
    assert(Multimodal.parseMp3L3(bt1).isEmpty)
    // block_type 11 (bt 3) likewise
    val bt3 = good.clone()
    bt3(10) = (bt3(10) | 0x0c).toByte
    assert(Multimodal.parseMp3L3(bt3).isEmpty)
    // mixed_block_flag (bit 54) set
    val mixed = good.clone()
    mixed(10) = (mixed(10) | 0x02).toByte
    assert(Multimodal.parseMp3L3(mixed).isEmpty)
    // scfsi nibble nonzero while a granule is short (bit 14 — byte 5)
    val scfsi = good.clone()
    scfsi(5) = (scfsi(5) | 0x02).toByte
    assert(Multimodal.parseMp3L3(scfsi).isEmpty)
    // preflag with a short granule (granule-0 bit 74 — byte 13)
    val pf = good.clone()
    pf(13) = (pf(13) | 0x20).toByte
    assert(Multimodal.parseMp3L3(pf).isEmpty)
    // the long-block property/fixture families still decode (no
    // regression from the window-switching branch)
    assert(Multimodal.parseMp3L3(
      Multimodal.mp3L3Fixture(spark, 2).orderBy("id").collect()(1)
        .getAs[Array[Byte]]("media")).isDefined)
  }

  test("encoder refuses what the decoder rejects") {
    def spec(bt: Int, pf: Int) = Multimodal.Mp3GrSpec(
      210, 0, pf, 0, 0, (1, 1, 0), 0, 0, 0, _ => 0, _ => 0, 0,
      blockType = bt)
    intercept[IllegalArgumentException] {
      Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
        _ => 0, _ => 0, (_, _) => 0, (_, _, _) => spec(1, 0))
    }
    intercept[IllegalArgumentException] {
      Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
        _ => 0, _ => 0, (_, _) => 0, (_, _, _) => spec(2, 1))
    }
    intercept[IllegalArgumentException] { // scfsi nonzero with short
      Multimodal.encodeMp3L3(14, 0, mono = true, 1, protect = false,
        _ => 0, _ => 0, (_, _) => 5, (_, _, _) => spec(2, 0))
    }
  }
}
