package graft

import graft.operators.Multimodal

/** Rational resampling (q192): identity, pure decimation, upsampling,
  * round-half-even ties, 8-bit widening, strictness. */
class ResampleSpec extends SparkSpec {

  private def wav(rate: Int, ch: Int, s: Seq[Int]): Array[Byte] =
    Multimodal.encodeWav(rate, ch, s.map(_.toShort).toArray)

  test("identity ratio returns the input samples exactly") {
    val s = Seq(5, -7, 100, -32768, 32767, 0, 13)
    val d = Multimodal.parseResample(wav(16000, 1, s), 16000).get
    assert(d.nOut == s.length && d.outSum == s.map(_.toLong).sum &&
      d.outFirst == 5 && d.outLast == 13 &&
      d.outMin == -32768 && d.outMax == 32767)
  }

  test("48k to 16k is pure 1/3 decimation: every third sample, no interpolation") {
    val s = (0 until 30).map(i => i * 100 - 1400)
    val d = Multimodal.parseResample(wav(48000, 1, s), 16000).get
    val picked = s.indices.filter(_ % 3 == 0).map(i => s(i).toLong)
    assert(d.nOut == picked.length && d.outSum == picked.sum &&
      d.outFirst == picked.head && d.outLast == picked.last)
  }

  test("upsampling 8k to 12k (L/M = 3/2): midpoints interpolate half-even") {
    // positions n*2/3: n=0 -> s0; n=1 -> k=0, f=2: (s0*1 + s1*2)/3;
    // n=2 -> s1 exactly; ...
    val s = Seq(0, 3, 9, 9)
    val d = Multimodal.parseResample(wav(8000, 1, s), 12000).get
    // positions n*2/3: 0, 2/3, 4/3, 2, 8/3 -> nOut = 5;
    // y = [0, rne(0*1+3*2,3)=2, rne(3*2+9*1,3)=5, 9, rne(9*1+9*2,3)=9]
    assert(d.nOut == 5 && d.outFirst == 0 && d.outLast == 9)
    assert(d.outSum == 0L + 2 + 5 + 9 + 9)
  }

  test("round-half-even at the tie: .5 goes to the even neighbor") {
    // 8k -> 12k with s = [1, 0]: n=1 sits at 2/3 -> a = 1*1 + 0*2 = 1,
    // y = rne(1, 3) = 0; craft an exact .5 with L=2 (8k -> 16k? that's
    // integer L/M = 2/1, f=0 always) — use 6k -> 4k? M/L = 3/2,
    // position n*3/2: n=1 -> k=1, f=1, L=2: a = s1 + s2; s1=1, s2=0
    // -> a=1 -> rne(1,2)=0 (tie to even); s1=1, s2=2 -> a=3 ->
    // rne(3,2)=2
    val d0 = Multimodal.parseResample(wav(6000, 1, Seq(0, 1, 0, 0)), 4000).get
    assert(d0.nOut == 3 && d0.outSum == 0L + 0 + 0) // [s0, rne(1,2)=0, s3]
    val d1 = Multimodal.parseResample(wav(6000, 1, Seq(0, 1, 2, 0)), 4000).get
    assert(d1.outSum == 0L + 2 + 0) // rne(3,2) = 2 (tie up to even)
  }

  test("8-bit input widens (u-128)*256 before interpolation") {
    val dataLen = 4
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(48000).putInt(48000)
      .putShort(1).putShort(8)
      .put("data".getBytes("ASCII")).putInt(dataLen)
    Seq(128, 129, 130, 131).foreach(v => bb.put(v.toByte))
    val d = Multimodal.parseResample(bb.array(), 16000).get
    assert(d.nOut == 2 && d.outFirst == 0 && d.outLast == 768) // 3*256
  }

  test("strictness: junk, sub-2-sample streams, bad out rate") {
    assert(Multimodal.parseResample(null, 16000).isEmpty)
    assert(Multimodal.parseResample(
      Array.tabulate[Byte](64)(i => (i * 17).toByte), 16000).isEmpty)
    assert(Multimodal.parseResample(wav(16000, 1, Seq(1)), 8000).isEmpty)
    assert(Multimodal.parseResample(wav(16000, 1, Seq(1, 2)), 0).isEmpty)
  }
}
