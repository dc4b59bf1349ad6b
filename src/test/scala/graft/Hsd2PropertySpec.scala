package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.decode.Hsd2
import graft.model.ComponentConfig

/** Property-based decode spec (native ScalaCheck): for arbitrary
  * block streams, the framer must preserve every value
  * (× sensitivity), land each block's final sample exactly on its
  * embedded timestamp, and produce strictly increasing times for
  * strictly increasing timestamps. */
object Hsd2PropertySpec extends Properties("Hsd2") {

  private val genCase = for {
    spts <- Gen.choose(1, 32)
    dim <- Gen.choose(1, 4)
    nBlocks <- Gen.choose(1, 8)
    sens <- Gen.oneOf(1.0, 0.5, 0.000488)
    values <- Gen.listOfN(nBlocks * spts * dim,
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    deltas <- Gen.listOfN(nBlocks, Gen.choose(1, 1000))
  } yield (spts, dim, nBlocks, sens, values.map(_.toShort), deltas.map(_ / 100.0))

  property("decode preserves values, block timestamps, monotonicity") =
    Prop.forAllNoShrink(genCase) { case (spts, dim, nBlocks, sens, values, deltas) =>
      val cfg = ComponentConfig("s", enabled = true, odr = 1000.0, dim = dim,
        dataType = "int16", samplesPerTs = spts, ioffset = 0.0, sensitivity = sens)
      val ts = deltas.scanLeft(0.0)(_ + _).tail // strictly increasing block ends
      val bb = ByteBuffer.allocate(nBlocks * cfg.blockBytes).order(ByteOrder.LITTLE_ENDIAN)
      values.grouped(spts * dim).zip(ts.iterator).foreach { case (block, t) =>
        block.foreach(bb.putShort)
        bb.putDouble(t)
      }
      val out = Hsd2.decodeBlocks(bb.array(), cfg, nBlocks, anchor = 0.0).toVector
      val times = out.map(_.time)

      (out.size == nBlocks * spts) :| "row count" &&
        (out.flatMap(_.values) == values.map(_ * sens).toVector) :| "values×sens" &&
        (0 until nBlocks).forall(k => out((k + 1) * spts - 1).time == ts(k)) :|
          "last sample on block timestamp" &&
        times.zip(times.tail).forall { case (a, b) => a < b } :| "monotone times" &&
        (times.head > 0.0) :| "first after anchor"
    }
}
