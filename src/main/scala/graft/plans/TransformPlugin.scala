package graft.plans

import org.apache.spark.sql.DataFrame

/** SPI for RUNTIME-DISCOVERED pipeline plugins — the JVM-idiomatic
  * analogue of the reference's directory scan for `.py` plugin files
  * (dtk wheel `HSD_DataToolkit_Pipeline.py:36-61`, which globs a
  * plugin dir and imports what it finds). On Spark the deployment
  * unit is a jar on the session classpath (`--jars` / `spark.jars`),
  * so discovery is the standard `java.util.ServiceLoader` protocol:
  * implement this trait with a no-arg constructor and list the class
  * in `META-INF/services/graft.plans.TransformPlugin`; every jar
  * shipped to the session contributes its plugins without any code
  * change in the engine — see [[TransformChain.discover]].
  */
trait TransformPlugin {

  /** Stable name, surfaced to lifecycle callbacks and logs. */
  def name: String

  /** Chain position: lower runs first; ties break by name, so the
    * composed chain is deterministic regardless of provider-file or
    * classloader enumeration order. */
  def order: Int = 100

  /** The transform itself — one stage of the folded logical plan. */
  def stage: DataFrame => DataFrame
}
