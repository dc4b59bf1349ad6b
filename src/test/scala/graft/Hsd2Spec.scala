package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.decode.Hsd2
import graft.model.ComponentConfig

class Hsd2Spec extends AnyFunSuite {

  private def cfg(spts: Int = 4, dim: Int = 3, sens: Double = 1.0) =
    ComponentConfig("iis3dwb_acc", enabled = true, odr = 4.0, dim = dim,
      dataType = "int16", samplesPerTs = spts, ioffset = 0.0, sensitivity = sens)

  /** Hand-built two-block stream: spts=4, dim=3, timestamps 1.0, 2.0. */
  private def twoBlocks(): Array[Byte] = {
    val c = cfg()
    val bb = ByteBuffer.allocate(2 * c.blockBytes).order(ByteOrder.LITTLE_ENDIAN)
    for (b <- 0 until 2) {
      for (i <- 0 until 4; d <- 0 until 3)
        bb.putShort((100 * b + 10 * i + d).toShort)
      bb.putDouble((b + 1).toDouble)
    }
    bb.array()
  }

  test("framing math: complete blocks and block size") {
    val c = cfg()
    assert(c.blockBytes == 4 * 3 * 2 + 8)
    assert(Hsd2.completeBlocks(2L * c.blockBytes + 5, c) == 2)
  }

  test("decode: values, sensitivity scaling, sample-major layout") {
    val out = Hsd2.decodeBlocks(twoBlocks(), cfg(sens = 0.5), 2, 0.0).toSeq
    assert(out.size == 8)
    // first sample of block 0: raws (0,1,2) × 0.5
    assert(out.head.values.toSeq == Seq(0.0, 0.5, 1.0))
    // sample 2 of block 1: raws (120,121,122) × 0.5
    assert(out(6).values.toSeq == Seq(60.0, 60.5, 61.0))
  }

  test("decode: linear time interpolation, last sample on block timestamp") {
    val out = Hsd2.decodeBlocks(twoBlocks(), cfg(), 2, 0.0).toSeq
    // block 0: anchor 0.0 → t1=1.0, samples at .25 .5 .75 1.0
    assert(out.map(_.time).take(4) == Seq(0.25, 0.5, 0.75, 1.0))
    // block 1: anchor 1.0 → t1=2.0
    assert(out.map(_.time).drop(4) == Seq(1.25, 1.5, 1.75, 2.0))
  }

  test("decode: ioffset anchors the first block") {
    val out = Hsd2.decodeBlocks(twoBlocks(), cfg(), 2, 0.6).toSeq
    assert(math.abs(out.head.time - (0.6 + 0.1)) < 1e-12)
    assert(out(3).time == 1.0) // last sample still lands on the timestamp
  }

  test("decode: trailing partial block ignored via completeBlocks") {
    val c = cfg()
    val bytes = twoBlocks() ++ Array.fill[Byte](7)(1)
    val n = Hsd2.completeBlocks(bytes.length.toLong, c).toInt
    assert(n == 2)
    assert(Hsd2.decodeBlocks(bytes, c, n, 0.0).size == 8)
  }

  test("unframed decode (samples_per_ts=0): time from odr") {
    val c = cfg(spts = 0, dim = 1)
    val bb = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(1).putShort(2).putShort(3)
    val out = Hsd2.decodeUnframed(bb.array(), c).toSeq
    assert(out.map(_.values.head) == Seq(1.0, 2.0, 3.0))
    assert(out.map(_.time) == Seq(0.0, 0.25, 0.5))
  }

  test("dtype matrix: every supported dtype round-trips framed AND unframed") {
    // (dtype, writer, expected decoded values) — covers sign/zero
    // extension of the unsigned branches the old unframed path lacked
    val cases: Seq[(String, ByteBuffer => Unit, Seq[Double])] = Seq(
      ("int16", bb => Seq(-2, 0, 32767).foreach(v => bb.putShort(v.toShort)),
        Seq(-2.0, 0.0, 32767.0)),
      ("uint16", bb => Seq(0xFFFE, 0, 7).foreach(v => bb.putShort(v.toShort)),
        Seq(65534.0, 0.0, 7.0)),
      ("int8", bb => Seq(-128, 0, 127).foreach(v => bb.put(v.toByte)),
        Seq(-128.0, 0.0, 127.0)),
      ("uint8", bb => Seq(0xFF, 0, 1).foreach(v => bb.put(v.toByte)),
        Seq(255.0, 0.0, 1.0)),
      ("int32", bb => Seq(-70000, 0, 70000).foreach(bb.putInt),
        Seq(-70000.0, 0.0, 70000.0)),
      ("uint32", bb => Seq(0xFFFFFFFE, 0, 9).foreach(v => bb.putInt(v.toInt)),
        Seq(4294967294.0, 0.0, 9.0)),
      ("float32", bb => Seq(-1.5f, 0f, 2.25f).foreach(bb.putFloat),
        Seq(-1.5, 0.0, 2.25)),
      ("float64", bb => Seq(-1.25, 0.0, 3.5).foreach(bb.putDouble),
        Seq(-1.25, 0.0, 3.5)))
    cases.foreach { case (dtype, writeVals, expect) =>
      val cFramed = ComponentConfig("s", enabled = true, odr = 4.0, dim = 1,
        dataType = dtype, samplesPerTs = 3, ioffset = 0.0, sensitivity = 1.0)
      val bbF = ByteBuffer.allocate(cFramed.blockBytes).order(ByteOrder.LITTLE_ENDIAN)
      writeVals(bbF); bbF.putDouble(1.0)
      val framed = Hsd2.decodeBlocks(bbF.array(), cFramed, 1, 0.0).toSeq
      assert(framed.map(_.values.head) == expect, s"framed $dtype")

      val cRaw = cFramed.copy(samplesPerTs = 0)
      val bbU = ByteBuffer.allocate(3 * cRaw.bytesPerSample).order(ByteOrder.LITTLE_ENDIAN)
      writeVals(bbU)
      val unframed = Hsd2.decodeUnframed(bbU.array(), cRaw).toSeq
      assert(unframed.map(_.values.head) == expect, s"unframed $dtype")
    }
  }
}
