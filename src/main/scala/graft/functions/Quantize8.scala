package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Exact HALF_UP quantization of a double at decimal scale 8,
  * returning the UNSCALED long: `quantize8(v) = round_half_up(v·10⁸)`
  * computed on the exact binary value of `v` — bit-identical to the
  * value of `CAST(v AS DECIMAL(p, 8))` for every finite double whose
  * quantization fits a long, but in pure 64/128-bit integer
  * arithmetic (`Math.multiplyHigh` over the IEEE mantissa) instead of
  * per-row `BigDecimal.setScale` churn. Motivation: the decimal-exact
  * order-independent sum pattern (q02/q08 dsum, Rms) costs ~12× a
  * plain long sum through Spark's decimal cast + decimal hash-agg
  * buffers (measured 4.4 s vs 0.35 s over the 16M-row ingest
  * fixture); summing these unscaled longs and re-materializing one
  * DECIMAL per OUTPUT row is value-identical and removes the ingest
  * path's largest non-I/O cost. Exactness is property-gated against
  * the `BigDecimal` reference in QuantizeSpec (including ties,
  * subnormals and sign). Non-finite input or a quantization beyond
  * the long range raises `ArithmeticException` — the ANSI posture:
  * loud, never wrong. */
case class Quantize8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize8 requires a double input, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "quantize8"

  protected override def nullSafeEval(v: Any): Any =
    Quantize8.quantize8(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Quantize8.quantize8($c)")

  override protected def withNewChildInternal(newChild: Expression): Quantize8 =
    copy(child = newChild)
}

object Quantize8 {

  /** round_half_up(v·10⁸) over the EXACT value of the double `v`.
    *
    * Decompose |v| = m·2^e (m ≤ 2⁵³ integer), so
    * v·10⁸ = m·5⁸·2^(e+8). m·5⁸ < 2⁷² lives in a 128-bit (hi, lo)
    * pair; a right shift by s = −(e+8) with the shifted-out top bit
    * deciding the round-up is exactly HALF_UP (ties away from zero,
    * applied to |v| then signed). No floating-point op after the
    * decomposition, so there is no double-rounding hazard. */
  def quantize8(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val neg = bits < 0
    val biasedExp = ((bits >>> 52) & 0x7ff).toInt
    if (biasedExp == 0x7ff)
      throw new ArithmeticException(s"quantize8: non-finite input $v")
    val frac = bits & 0x000fffffffffffffL
    val m = if (biasedExp == 0) frac else frac | 0x0010000000000000L
    if (m == 0L) return 0L
    val e = if (biasedExp == 0) -1074 else biasedExp - 1075
    val P = 390625L // 5⁸; 10⁸ = 2⁸·5⁸
    val hi = Math.multiplyHigh(m, P)
    val lo = m * P
    val sh = e + 8
    val r: Long =
      if (sh >= 0) {
        // value = (hi,lo) << sh must fit a positive long
        if (hi != 0L || lo < 0L || sh >= 63 ||
          (sh > 0 && (lo >>> (63 - sh)) != 0L))
          throw new ArithmeticException(s"quantize8: $v out of long range")
        lo << sh
      } else {
        val s = -sh
        if (s >= 128) 0L // < 2⁷²·2⁻¹²⁸ ≪ ½ → rounds to zero
        else if (s >= 64) {
          val s2 = s - 64
          val q = if (s2 == 0) hi else hi >>> s2
          val up =
            if (s2 == 0) (lo >>> 63) == 1L
            else ((hi >>> (s2 - 1)) & 1L) == 1L
          q + (if (up) 1L else 0L)
        } else { // 1 ≤ s ≤ 63
          // fits iff t < 2^(63+s) ⟺ hi < 2^(s−1); checking q's sign
          // alone would let t ≥ 2^(64+s) wrap silently through the
          // hi << (64−s) truncation
          val up = ((lo >>> (s - 1)) & 1L) == 1L
          if ((hi >>> (s - 1)) != 0L)
            throw new ArithmeticException(s"quantize8: $v out of long range")
          val q = (lo >>> s) | (hi << (64 - s))
          if (up && q == Long.MaxValue)
            throw new ArithmeticException(s"quantize8: $v out of long range")
          q + (if (up) 1L else 0L)
        }
      }
    if (neg) -r else r
  }

  def apply(c: Column): Column =
    ColumnShim.column(Quantize8(ColumnShim.expression(c)))
}
