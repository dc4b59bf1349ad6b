package graft.plugins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TransformPlugin

/** Test fixtures for the ServiceLoader discovery path — registered in
  * src/test/resources/META-INF/services/graft.plans.TransformPlugin.
  * Declared order (20 < 50) is the REVERSE of provider-file order, so
  * the ordering contract is actually exercised. */
class ScaleValuesPlugin extends TransformPlugin {
  override def name: String = "scale_values"
  override def order: Int = 50
  override def stage: DataFrame => DataFrame =
    _.withColumn("v", col("v") * 10)
}

class AddOnePlugin extends TransformPlugin {
  override def name: String = "add_one"
  override def order: Int = 20
  override def stage: DataFrame => DataFrame =
    _.withColumn("v", col("v") + 1)
}
