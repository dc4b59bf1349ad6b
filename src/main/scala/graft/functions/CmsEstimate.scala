package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point lookup into a pre-built Count-Min sketch: the upper-bound
  * frequency estimate of a LONG key (CMS guarantees estimate ≥ true
  * count — one-sided error). The serialized sketch travels in the
  * expression (a bounded depth×width table, independent of data
  * volume) and deserializes ONCE per executor via the codegen
  * reference-object table — per row this is d hash probes over a
  * long[][], inside whole-stage codegen.
  *
  * The scale pattern it enables (see operators/HeavyHitters): a
  * one-pass distributed sketch of the full keyspace, then
  * `estimate < T` prunes keys that PROVABLY cannot be heavy before
  * the exact aggregation — the wide shuffle carries only candidate
  * keys; the exact count on the survivors makes the final output
  * exact, never approximate.
  */
case class CmsEstimate(sketch: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires a BIGINT key, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // deserialized once per JVM that evaluates the expression; the
  // CountMinSketchImpl is java.io.Serializable, so the codegen
  // reference table can ship the OBJECT (bytes only re-parse when the
  // expression itself is re-serialized)
  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketch))

  protected override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", cms,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c =>
      s"$ref.estimateCount((Object) java.lang.Long.valueOf($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)

  // the byte payload would bloat toString/explain output
  override def toString: String = s"cms_estimate(${sketch.length}B, $child)"
}

object CmsEstimate {
  def apply(sketch: Array[Byte], key: Column): Column =
    ColumnShim.column(CmsEstimate(sketch, ColumnShim.expression(key)))
}
