package graft

import java.math.RoundingMode

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Quantize8

/** Quantize8 must be BIT-IDENTICAL to the BigDecimal HALF_UP
  * reference (what Spark's double→decimal cast computes) for every
  * finite double whose quantization fits a long — that equivalence is
  * what lets Rms swap the decimal aggregation for a long sum without
  * moving a single output bit. Generators cover ordinary magnitudes,
  * tiny/subnormal values, EXACT half-ties (v = odd·2⁻⁹ makes v·10⁸ an
  * exact k+½), near-ties, random bit patterns, and the out-of-range
  * overflow contract. */
object QuantizePropertySpec extends Properties("Quantize8") {

  private def ref(v: Double): java.math.BigInteger =
    new java.math.BigDecimal(v).setScale(8, RoundingMode.HALF_UP)
      .unscaledValue()

  private def agrees(v: Double): Prop = {
    val want = ref(v)
    val fits =
      try { want.longValueExact(); true }
      catch { case _: ArithmeticException => false }
    if (fits)
      Prop(Quantize8.quantize8(v) == want.longValueExact()) :|
        s"v=$v want=$want got=${Quantize8.quantize8(v)}"
    else
      Prop(Prop.throws(classOf[ArithmeticException])(
        Quantize8.quantize8(v))) :| s"v=$v should overflow"
  }

  property("ordinary magnitudes match BigDecimal") =
    Prop.forAll(Gen.choose(-1000.0, 1000.0))(agrees)

  property("tiny magnitudes (including the sub-grid range) match") =
    Prop.forAll(Gen.choose(-1e-6, 1e-6))(agrees)

  property("large in-range magnitudes match") =
    Prop.forAll(Gen.choose(-9.0e10, 9.0e10))(agrees)

  property("EXACT half-ties round away from zero like HALF_UP") =
    Prop.forAll(Gen.choose(0L, 1L << 50), Gen.oneOf(-1, 1)) { (m, sgn) =>
      // v = (2m+1)·2⁻⁹ ⇒ v·10⁸ = (2m+1)·5⁸/2: an exact k+½ tie
      val v = sgn * (2 * m + 1).toDouble * math.pow(2, -9)
      agrees(v)
    }

  property("near-tie doubles (k+0.5)/1e8 match") =
    Prop.forAll(Gen.choose(-(1L << 40), 1L << 40)) { k =>
      agrees((k.toDouble + 0.5) / 1e8)
    }

  property("random bit patterns match or overflow loudly") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { bits =>
      val v = java.lang.Double.longBitsToDouble(bits)
      if (v.isNaN || v.isInfinite)
        Prop(Prop.throws(classOf[ArithmeticException])(
          Quantize8.quantize8(v)))
      else agrees(v)
    }

  property("subnormals quantize to zero (all far below the 1e-8 grid)") =
    Prop.forAll(Gen.choose(1L, (1L << 52) - 1)) { frac =>
      val v = java.lang.Double.longBitsToDouble(frac) // biased exp 0
      Quantize8.quantize8(v) == 0L && ref(v).signum == 0
    }
}
