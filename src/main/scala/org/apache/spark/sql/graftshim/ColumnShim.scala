package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters —
  * the sanctioned escape hatch for registering custom Catalyst
  * expressions from a library (lives in the sql package scope on
  * purpose; keep it tiny). */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Internal-row DataFrame constructor: lets a source emit
    * `UnsafeRow`s directly (no Row → Catalyst conversion per field).
    * The standard fast path for custom sources. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Register a function on an ALREADY-RUNNING session (the
    * builder-time path is SparkSessionExtensions; this is the
    * notebook/REPL path). */
  def registerFunction(
      spark: SparkSession,
      name: catalyst.FunctionIdentifier,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState
      .functionRegistry.registerFunction(name, info, builder)
}
