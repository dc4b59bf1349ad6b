package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: for each entity, the
  * earliest time it completes each *prefix* of a step sequence in
  * order (step i must happen strictly after the entity's recorded
  * step-(i−1) time). The classic product-analytics operator
  * (view → click → purchase conversion), expressed as a chain of
  * conditional min-aggregations — no sessionization library, no
  * per-entity event materialization.
  *
  * Scale shape: every join and aggregation below keys on `entityCol`,
  * so after the first shuffle the plan reuses one hash partitioning
  * across all stages (Exchange reuse / AQE); per-stage state is one
  * row per entity that reached the stage — monotonically shrinking.
  * Nothing collects an entity's event list, so a power user with 10^8
  * events costs no more memory than one with 10.
  *
  * Reference scope: the reference engine (`main.py`) has no funnel
  * operator; this is part of the training/analytics extension suite
  * (SURVEY.md §2 ext).
  */
object Funnel {

  /** One row per entity that completed step 1, with the completion
    * time of each step (`t1..tN`, null once the funnel breaks) and
    * `depth` = number of steps completed. Times are whatever unit
    * `timeCol` carries (long recommended); comparisons are strict
    * (`>`), so a step at the exact same timestamp as its predecessor
    * does NOT advance the funnel — deterministic and
    * order-of-arrival-independent.
    */
  def funnel(events: DataFrame, entityCol: String, typeCol: String,
             timeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    val ent = col(entityCol)
    // Stage 1: earliest step-1 event per entity.
    var state = events.filter(col(typeCol) === steps.head)
      .groupBy(ent).agg(min(col(timeCol)).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      // Candidates: step-i events strictly after the entity's t_{i-1}.
      val cand = events.filter(col(typeCol) === step)
        .join(state.select(ent, col(prev)), Seq(entityCol))
        .where(col(timeCol) > col(prev))
        .groupBy(ent).agg(min(col(timeCol)).as(cur))
      state = state.join(cand, Seq(entityCol), "left")
    }
    val depth = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    state.withColumn("depth", depth)
  }

  /** Funnel conversion summary: for each step index (1-based), how
    * many entities reached it. Row `i` counts entities with
    * `depth >= i`. */
  def funnelCounts(events: DataFrame, entityCol: String, typeCol: String,
                   timeCol: String, steps: Seq[String]): DataFrame = {
    val f = funnel(events, entityCol, typeCol, timeCol, steps)
    val perStep: Seq[Column] = steps.indices.map(i =>
      sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
        .as(s"n${i + 1}"))
    val wide = f.agg(perStep.head, perStep.tail: _*)
    // Unpivot to (step, n_entities) — tiny (|steps| rows).
    val stacked = steps.indices.map(i =>
      s"${i + 1}L, n${i + 1}").mkString(", ")
    wide.selectExpr(
      s"stack(${steps.size}, $stacked) AS (step, n_entities)")
  }
}
