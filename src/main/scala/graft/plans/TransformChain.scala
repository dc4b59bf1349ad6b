package graft.plans

import org.apache.spark.sql.DataFrame

/** The reference's plugin pipeline (O20, dtk wheel
  * `HSD_DataToolkit_Pipeline.py:134-138`): an ordered chain of named
  * transforms folded over the data — `data = plugin.process(data)` —
  * plus lifecycle callbacks.
  *
  * Spark-first shape: each plugin is a `DataFrame => DataFrame`
  * applied with `Dataset.transform`, so the WHOLE chain is one
  * logical plan — Catalyst optimizes across plugin boundaries
  * (column pruning through all stages, predicate pushdown past
  * narrow stages), which the reference's eager per-packet fold
  * cannot do. Lifecycle (start/stop/tag of the reference's
  * `start_log_cb`/`stop_log_cb`/`tag_cb`) maps to
  * `StreamingQueryListener` for streams and plain callbacks here.
  */
object TransformChain {

  type Stage = DataFrame => DataFrame

  final case class Plugin(name: String, stage: Stage)

  /** Fold the chain: `chain(plugins)(df)` ≡
    * `df.transform(p1).transform(p2)…`. */
  def chain(plugins: Seq[Plugin]): Stage =
    df => plugins.foldLeft(df)((d, p) => d.transform(p.stage))

  /** Runtime plugin discovery (the reference's `.py`-dir scan,
    * re-expressed as the JVM ServiceLoader SPI — see
    * [[TransformPlugin]]): collects every implementation registered
    * on the classpath, ordered by (order, name) so the composed
    * chain is deterministic regardless of provider enumeration
    * order. Jars added via `--jars` contribute plugins with zero
    * engine changes. */
  def discover(loader: ClassLoader =
      Thread.currentThread.getContextClassLoader): Seq[Plugin] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[TransformPlugin], loader)
      .asScala.toSeq
      .sortBy(p => (p.order, p.name))
      .map(p => Plugin(p.name, p.stage))
  }

  /** Chain with lifecycle callbacks (batch flavor of the dtk
    * pipeline's cb hooks): onStart before the plan is built, onStage
    * after each plugin attaches its transform, onComplete with the
    * final frame. Callbacks see plan-building, not execution — the
    * plan stays lazy end to end. */
  def run(
      plugins: Seq[Plugin],
      input: DataFrame,
      onStart: () => Unit = () => (),
      onStage: String => Unit = _ => (),
      onComplete: DataFrame => Unit = _ => ()): DataFrame = {
    onStart()
    val out = plugins.foldLeft(input) { (d, p) =>
      val next = d.transform(p.stage)
      onStage(p.name)
      next
    }
    onComplete(out)
    out
  }
}
