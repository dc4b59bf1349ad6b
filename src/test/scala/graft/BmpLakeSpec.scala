package graft

import graft.operators.BmpLake

/** BMP walk: fixture-law equality, the ORIENTATION pin (bottom-up vs
  * top-down must land the same image), header/palette/padding
  * strictness at pinned offsets, byte-flip + truncation sweeps. */
class BmpLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = BmpLake.extractBmp(
      BmpLake.bmpFixture(spark, 12), "id", "media")
      .orderBy("id").collect()
    assert(out.forall(_.getBoolean(8)))
    out.foreach { r =>
      val i = r.getLong(0).toInt
      val w = 3 + i % 5
      val h = 2 + i % 4
      val bpp = if (i % 2 == 0) 8 else 24
      val nc = if (bpp == 8) 64 + 64 * (i % 3) else 0
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getBoolean(3) == (i % 3 == 0))
      assert(r.getInt(4) == bpp && r.getInt(5) == nc)
      def px(x: Int, y: Int): Long =
        if (bpp == 8) {
          val k = (x + y * w + i) % nc
          (k * 3 % 256 + k * 5 % 256 + k * 7 % 256).toLong
        } else ((i + 3 * x + 7 * y) % 256 + (2 * i + 5 * x + 11 * y) % 256 +
          (3 * i + 7 * x + 13 * y) % 256).toLong
      val want = (for (y <- 0 until h; x <- 0 until w) yield px(x, y)).sum
      assert(r.getLong(6) == want, s"pixel sum file $i")
      assert(r.getLong(7) == (0 until w).map(px(_, 0)).sum,
        s"row0 sum file $i")
    }
  }

  test("orientation pin: bottom-up and top-down encode the same image") {
    // file 0 is top-down, file 1 bottom-up — re-derive: a bottom-up
    // copy of a top-down file must decode to the SAME row0_sum
    val seeds = BmpLake.bmpFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    val td = BmpLake.parseBmp(seeds(0)).get
    assert(td.topdown)
    // flip the height sign WITHOUT reordering rows: decode changes
    val flipped = seeds(0).clone()
    val h = td.height.toLong & 0xffffffffL
    (0 until 4).foreach(k => flipped(22 + k) = ((h >> (8 * k)) & 0xff).toByte)
    val fb = BmpLake.parseBmp(flipped).get
    assert(!fb.topdown && fb.pixelSum == td.pixelSum)
    assert(fb.row0Sum != td.row0Sum,
      "flipping orientation must move the top row (else row0 is no pin)")
  }

  test("strictness matrix: every pinned-offset lie rejects") {
    val seeds = BmpLake.bmpFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    val g8 = seeds(0) // 8-bpp
    val g24 = seeds(1) // 24-bpp
    def mut(src: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = src.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad magic" -> mut(g8)(_(0) = 'X'),
      "declared size lie" -> mut(g8)(_(2) = (g8(2) ^ 1).toByte),
      "reserved word set" -> mut(g8)(_(6) = 1),
      "data offset lie" -> mut(g8)(_(10) = (g8(10) ^ 4).toByte),
      "V5 header size (124)" -> mut(g8)(_(14) = 124.toByte),
      "planes 2" -> mut(g8)(_(26) = 2),
      "bpp 16" -> mut(g24)(_(28) = 16),
      "BI_RLE8 compression" -> mut(g8)(_(30) = 1),
      "sizeImage lie" -> mut(g8)(_(34) = 7),
      "palette on a 24-bpp file" -> mut(g24)(_(46) = 4),
      "nonzero palette reserved byte" -> mut(g8)(_(57) = 1),
      "8-bpp index outside the palette" -> mut(g8) { c =>
        val nc = 64 // file 0: nc = 64
        val off = 14 + 40 + 4 * nc
        c(off) = 0xff.toByte // 255 >= 64
      },
      "truncated pixel array" -> g8.dropRight(1),
      "trailing byte" -> (g8 ++ Array[Byte](0)),
      "tiny file" -> g8.take(40))
    cases.foreach { case (name, b) =>
      assert(BmpLake.parseBmp(b).isEmpty, name)
    }
    // dirty padding, done properly: file 0 is 8-bpp w=3 → stride 4,
    // padding byte at row end must be zero
    val w0 = 3
    val nc0 = 64
    val off0 = 14 + 40 + 4 * nc0
    val dirty = g8.clone()
    dirty(off0 + w0) = 7 // first row's padding byte
    assert(BmpLake.parseBmp(dirty).isEmpty, "dirty row padding")
    assert(BmpLake.parseBmp(null).isEmpty)
    assert(BmpLake.parseBmp(g8).nonEmpty && BmpLake.parseBmp(g24).nonEmpty,
      "controls parse")
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = BmpLake.bmpFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      BmpLake.parseBmp(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach(n => BmpLake.parseBmp(s0.take(n)))
  }
}
