package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Sanitize

/** Tag/label data path — the reference surface behind `labeled=True`
  * conversions and the pipeline's `tag_cb` lifecycle hook
  * (`main.py:78`, dtk `HSD_DataToolkit_Pipeline.py:23,125-127`):
  * human-made tag toggle events annotate the sample stream, and a
  * labeled export carries one boolean column per tag label that is
  * true while the tag was enabled.
  *
  * Spark-first shape: tag toggles are MANUAL annotations — a handful
  * of rows per acquisition — so they belong in the plan as literal
  * arrays, not in a join. Each label's sorted toggle history becomes
  * two array literals (ts, enable); the per-sample state is "enable
  * of the last toggle at or before t" evaluated with codegen'd
  * higher-order functions. Zero shuffles, zero broadcasts, scales
  * with the samples alone.
  */
object Tagging {

  /** One tag toggle: `label` switched to `enable` at epoch-ns `ts`
    * (parsed from acquisition_info.json's `tags` by
    * [[graft.model.AcquisitionInfo]], or supplied programmatically). */
  type TagToggle = graft.model.TagToggle
  val TagToggle = graft.model.TagToggle

  /** State of one label at sample time `t`: enable of the last toggle
    * ≤ t, false before the first toggle. The index is a fold of
    * comparisons (no per-row array allocation — this runs once per
    * sample per label in the labeled-ingest hot path); the enable
    * lookup array is all-literal ⇒ constant-folded once. */
  private def stateAt(toggles: Seq[TagToggle], t: Column): Column = {
    val sorted = toggles.sortBy(_.ts)
    val enArr = array(sorted.map(x => lit(x.enable)): _*)
    val idx = sorted.map(x => when(lit(x.ts) <= t, 1).otherwise(0))
      .reduce[Column](_ + _)
    when(idx === 0, lit(false)).otherwise(element_at(enArr, idx))
  }

  /** Append one `tag_<label>` boolean column per distinct label.
    * @param timeCol epoch-ns long sample time (post-enrich `Time`) */
  def labelSamples(
      samples: DataFrame,
      toggles: Seq[TagToggle],
      timeCol: String = "Time"): DataFrame = {
    val byLabel = toggles.groupBy(_.label).toSeq.sortBy(_._1)
    // two distinct labels colliding post-sanitization would silently
    // overwrite each other's column — refuse instead
    val colNames = byLabel.map { case (l, _) => Sanitize.column(l) }
    require(colNames.distinct.size == colNames.size,
      s"tag labels collide after sanitization: ${byLabel.map(_._1).mkString(", ")}")
    byLabel.foldLeft(samples) { case (df, (label, ts)) =>
      df.withColumn(s"tag_${Sanitize.column(label)}",
        stateAt(ts, col(timeCol)))
    }
  }

  /** Intervals view of a toggle history: (label, start_ns, end_ns)
    * with end = next disable (exclusive) or Long.MaxValue while still
    * enabled — the shape range-join consumers want. */
  def intervals(toggles: Seq[TagToggle]): Seq[(String, Long, Long)] =
    toggles.groupBy(_.label).toSeq.sortBy(_._1).flatMap { case (label, ts) =>
      val sorted = ts.sortBy(_.ts)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var openAt = -1L
      sorted.foreach { t =>
        if (t.enable && openAt < 0) openAt = t.ts
        else if (!t.enable && openAt >= 0) {
          out += ((label, openAt, t.ts)); openAt = -1L
        }
      }
      if (openAt >= 0) out += ((label, openAt, Long.MaxValue))
      out.toSeq
    }
}
