package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Image dHash + near-dup pairs (q190): law replay, downsample scale
  * invariance, the Hamming-0 cross-scale path, blocking exactness
  * against a brute-force reference, and decode strictness. */
class ImageDHashSpec extends SparkSpec {

  private def lawFp(r: Int): Long = {
    val g = r / 3; val m = r % 3; val geff = g - (g % 2)
    (0 until 63).foldLeft(0L) { (acc, k) =>
      val base = (geff * 5 + k * 3) % 7 < 3
      val flip = m match {
        case 1 => k == (3 * g) % 63 || k == (3 * g + 21) % 63
        case 2 => k == (3 * g + 7) % 63
        case _ => false
      }
      if (base ^ flip) acc | (1L << k) else acc
    }
  }

  test("fixture fingerprints match the law (the oracle's arithmetic)") {
    val n = 18
    val got = Multimodal.imageDHash(
        Multimodal.dhashFixture(spark, n), "id", "media")
      .orderBy("id").collect()
    for (r <- 0 until n) {
      assert(got(r).getAs[Boolean]("valid"), s"id $r")
      assert(got(r).getAs[Long]("dhash") == lawFp(r), s"fp id $r")
      val s = 1 + r % 3
      assert(got(r).getAs[Int]("width") == 9 * s &&
        got(r).getAs[Int]("height") == 8 * s)
    }
  }

  test("downsample scale invariance: one bit law, identical hash at 1x/2x/3x") {
    def bit(x: Int, y: Int): Boolean = (x * 3 + y * 5) % 4 < 2
    val fps = (1 to 3).map { s =>
      Multimodal.parseDHash(Multimodal.encodeDHashPng(bit, s)).get._1
    }
    assert(fps.distinct.size == 1)
    // and the hash is exactly the bit law
    val expect = (for (y <- 0 until 8; x <- 0 until 8 if bit(x, y))
      yield 1L << (y * 8 + x)).sum
    assert(fps.head == expect)
  }

  test("banded blocking is exact: pairs equal the brute-force reference") {
    val n = 24
    val fps = (0 until n).map(r => (r.toLong, lawFp(r)))
    val ref = (for {
      a <- 0 until n; b <- a + 1 until n
      h = java.lang.Long.bitCount(fps(a)._2 ^ fps(b)._2)
      if h <= 3
    } yield (a.toLong, b.toLong, h)).sorted
    assert(ref.nonEmpty && ref.exists(_._3 == 0),
      "fixture must exercise the Hamming-0 (shared-fingerprint) path")
    import spark.implicits._
    val got = Dedup.simhashNearDup(
        fps.toDF("id", "simhash"), maxDist = 3)
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == ref)
  }

  test("cross blocking is exact: pairs equal the brute-force cross reference") {
    val nA = 18; val nB = 21
    val a = (0 until nA).map(r => (r.toLong, lawFp(r)))
    val b = (0 until nB).map(r => (r.toLong + 1000, lawFp(r)))
    val ref = (for {
      (ia, fa) <- a; (ib, fb) <- b
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= 3
    } yield (ia, ib, h)).sorted
    assert(ref.exists(_._3 == 0) && ref.exists(_._3 > 0))
    import spark.implicits._
    val got = Dedup.simhashNearDupCross(
        a.toDF("id", "simhash"), b.toDF("id", "simhash"), maxDist = 3)
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == ref)
  }

  test("decode strictness: junk, truncation, and sub-grid images flag invalid") {
    assert(Multimodal.parseDHash(null).isEmpty)
    assert(Multimodal.parseDHash(
      Array.tabulate[Byte](256)(i => (i * 37).toByte)).isEmpty)
    val good = Multimodal.encodeDHashPng((x, y) => (x + y) % 2 == 0, 1)
    assert(Multimodal.parseDHash(good).isDefined)
    assert(Multimodal.parseDHash(
      java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    // an 8x8 image cannot carry the 9-column grid
    val small = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(small, "png", bos)
    assert(Multimodal.parseDHash(bos.toByteArray).isEmpty)
  }

  test("format invariance: BMP and WebP twins fingerprint equal to PNG") {
    // q212's law: the same picture in three containers must hash equal
    // at every fixture scale — a BMP path that flips rows, swaps
    // channels, or a VP8L path that mis-inverts a transform diverges
    // here before it ever reaches the pair join
    (0 until 9).foreach { r =>
      val bit = (x: Int, y: Int) => Multimodal.dhashBit(r)(x, y)
      val s = 1 + r % 3
      val png = Multimodal.parseDHash(Multimodal.encodeDHashPng(bit, s))
      val bmp = Multimodal.parseDHash(Multimodal.encodeDHashBmp(bit, s))
      val webp = Multimodal.parseDHash(Multimodal.encodeDHashWebp(bit, s))
      assert(png.isDefined && bmp.isDefined && webp.isDefined, s"r=$r")
      assert(png.get == bmp.get, s"BMP fingerprint diverges at r=$r")
      assert(png.get == webp.get, s"WebP fingerprint diverges at r=$r")
    }
    // and the twins really are their formats (strict dedicated walks)
    val asBmp = graft.operators.BmpLake.parseBmp(
      Multimodal.encodeDHashBmp((x, y) => (x + y) % 2 == 0, 2))
    assert(asBmp.exists(b => b.width == 18 && b.height == 16 && !b.topdown))
    val asWebp = graft.operators.WebpLake.parseVp8l(
      Multimodal.encodeDHashWebp((x, y) => (x + y) % 2 == 0, 2))
    assert(asWebp.exists(w => w.width == 18 && w.height == 16))
  }

  test("mixed-fixture routing: every Hamming-0 law pair crosses formats") {
    // the (r + r/3) % 3 routing exists so exact-duplicate pairs never
    // share a container — the property q212's comment claims
    def fmt(r: Int): Int = (r + r / 3) % 3
    for (g <- 0 until 6; m <- 0 until 3) {
      val a = 6 * g + m
      val b = 6 * g + 3 + m // the adjacent-group law duplicate
      assert(fmt(a) != fmt(b), s"pair ($a,$b) lands in one container")
    }
    // and all three containers actually occur
    assert((0 until 9).map(fmt).toSet == Set(0, 1, 2))
  }
}
