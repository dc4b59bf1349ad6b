package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst
  * expression with whole-stage codegen — the preferred extension
  * point when built-in functions can't express a scalar (custom
  * `Expression` beats UDF: no boxing, stays inside the generated
  * loop).
  *
  * fp(s) = Σ_i s[i] · B^(n-1-i)  mod  M,  B = 257, M = 2^61 − 1
  *
  * Computed over UTF-8 bytes left-to-right with Horner's rule using
  * 128-bit intermediate products (Math.multiplyHigh) so the modulus
  * is exact. Deterministic across JVMs/engines — the basis for
  * content-addressed dedup keys and shard-stable sampling.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  protected override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 257L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** Horner evaluation; (a·b) mod 2^61-1 via 128-bit product split. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = addMod(mulMod(h, Base), (bytes(i) & 0xff).toLong)
      i += 1
    }
    h
  }

  private def addMod(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= Mod) s - Mod else s
  }

  /** (a·b) mod (2^61−1) using the Mersenne fold: split the 128-bit
    * product into low 61 bits + high bits and add them mod M. */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // 128-bit value = hi·2^64 + lo; fold at 61 bits:
    val low61 = lo & Mod
    val rest = (hi << 3) | (lo >>> 61) // (hi·2^64 + lo) >> 61
    val s = low61 + rest
    if (s >= Mod) s - Mod else s
  }

  /** Column API: `fingerprint($"text")`. */
  def fingerprint(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      RollingHash(org.apache.spark.sql.graftshim.ColumnShim.expression(c)))
}
