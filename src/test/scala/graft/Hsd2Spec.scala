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
}
