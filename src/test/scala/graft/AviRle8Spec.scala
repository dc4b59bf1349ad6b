package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.Rle8Op._

/** MS-RLE8 inter-frame AVI decode (q189): independent law replay,
  * the retention contract (skipped pixels carry the previous frame),
  * and the corruption / legality matrix. */
class AviRle8Spec extends SparkSpec {

  test("fixture decode matches the independent law replay (the oracle's laws)") {
    val n = 12
    val got = Multimodal.decodeAviRle8(
        Multimodal.aviRle8Fixture(spark, n), "id", "media")
      .orderBy("id", "frame").collect()
    var idx = 0
    for (r <- 0 until n) {
      val w = 16 + (r % 4) * 8
      val h = 8 + r % 5
      val nf = 2 + r % 4
      val palSum = (0 until 256)
        .map(i => (3 * i) % 256 + (5 * i) % 256 + (7 * i) % 256).sum.toLong
      for (f <- 0 until nf) {
        val fbSum = (0 until h).map { y =>
          val g = (1 to f).find(g => (7 * g + r) % h == y)
          g match {
            case Some(gg) => w.toLong * ((r + 11 * gg) % 240) + 15
            case None =>
              w.toLong * ((r + 3 * y) % 240) + (if (y % 2 == 1) 10 else 0)
          }
        }.sum
        val row = got(idx); idx += 1
        assert(row.getAs[Boolean]("valid"), s"id $r frame $f")
        assert(row.getAs[Int]("width") == w && row.getAs[Int]("height") == h)
        assert(row.getAs[Long]("n_written") ==
          (if (f == 0) w.toLong * h else w.toLong), s"nw id $r f $f")
        assert(row.getAs[Long]("fb_sum") == fbSum, s"fb id $r f $f")
        assert(row.getAs[Long]("palette_sum") == palSum)
      }
    }
    assert(idx == got.length)
  }

  test("inter-frame retention: a skipped pixel survives N frames of deltas") {
    // 4x2, keyframe all 9s; three delta frames each rewrite only row 1
    // via the delta escape — row 0 must still be 9s at the end
    val pal = (i: Int) => (i, i, i)
    val key = Seq(Run(4, 9), Eol, Run(4, 9))
    val deltas = (1 to 3).map(f => Seq(Delta(0, 1), Run(4, 10 + f)))
    val b = Multimodal.encodeAviRle8(4, 2, pal, key +: deltas, 10)
    val d = Multimodal.parseAviRle8(b).get
    assert(d.frames.map(_._1) == Seq(8L, 4L, 4L, 4L))
    // fb sums: 8*9; then 4*9 + 4*(10+f)
    assert(d.frames.map(_._2) ==
      Seq(72L, 36L + 4 * 11, 36L + 4 * 12, 36L + 4 * 13))
  }

  test("corruption / legality matrix") {
    val pal = (i: Int) => (i, i, i)
    def enc(frames: Seq[Seq[Multimodal.Rle8Op]]): Array[Byte] =
      Multimodal.encodeAviRle8(8, 3, pal, frames, 10)
    val key = Seq(Run(8, 1), Eol, Run(8, 2), Eol, Run(8, 3))
    assert(Multimodal.parseAviRle8(enc(Seq(key))).isDefined)
    // a run overflowing its row rejects
    assert(Multimodal.parseAviRle8(
      enc(Seq(Seq(Run(9, 1), Eol, Run(8, 2), Eol, Run(8, 3))))).isEmpty)
    // an absolute segment overflowing its row rejects
    assert(Multimodal.parseAviRle8(
      enc(Seq(Seq(Run(6, 1), Abs(Seq(1, 2, 3)), Eol, Run(8, 2), Eol,
        Run(8, 3))))).isEmpty)
    // an out-of-bounds delta jump rejects
    assert(Multimodal.parseAviRle8(
      enc(Seq(key, Seq(Delta(0, 4), Run(8, 5))))).isEmpty)
    // writing past the last row rejects
    assert(Multimodal.parseAviRle8(
      enc(Seq(key :+ Eol :+ Run(1, 7)))).isEmpty)
    // clobbered EOB (trailing bytes after end-of-bitmap) rejects
    val good = enc(Seq(key))
    val moviAt = {
      var i = 12
      while (!(good(i) == 'm' && good(i + 1) == 'o' && good(i + 2) == 'v')) i += 1
      i
    }
    // the EOB is the last two payload bytes of the single 00dc chunk:
    // flip them to an EOL — decode then runs off the chunk end
    val chunkLen = (good(moviAt + 8) & 0xff) | ((good(moviAt + 9) & 0xff) << 8)
    val eobOff = moviAt + 12 + chunkLen - 1
    val noEob = good.clone(); noEob(eobOff) = 0 // 00 01 -> 00 00
    assert(Multimodal.parseAviRle8(noEob).isEmpty)
    // wrong biCompression (BI_RGB) rejects
    val raw = good.clone()
    val strfAt = {
      var i = 12
      while (!(raw(i) == 's' && raw(i + 1) == 't' && raw(i + 2) == 'r' &&
        raw(i + 3) == 'f')) i += 1
      i
    }
    raw(strfAt + 8 + 16) = 0
    assert(Multimodal.parseAviRle8(raw).isEmpty)
    // cross-discrimination with the MJPEG family, both directions
    val mjpeg = Multimodal.encodeAvi(12, 8, Seq(10, 200), 15)
    assert(Multimodal.parseAviRle8(mjpeg).isEmpty)
    assert(Multimodal.parseAvi(good).isEmpty)
    // truncation sweeps
    for (cut <- 1 to 8)
      assert(Multimodal.parseAviRle8(
        java.util.Arrays.copyOf(good, good.length - cut)).isEmpty)
  }
}
