package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` shape (SURVEY.md §2.B custom-state
  * streaming): maintain each entity's open session set across
  * micro-batches, emit a session only when the event-time watermark
  * has passed its close (last event + gap), so the output is
  * append-only and exactly matches the batch `session_window`
  * semantics (q32: events merge while consecutive gaps are < gap).
  *
  * Scale shape: state per entity is the COMPRESSED session list
  * (start, last, n) — O(open sessions), not O(events); merging a
  * micro-batch is a sort of that batch's per-entity instants only.
  * Watermark-driven `EventTimeTimeout` bounds state lifetime: once
  * the watermark passes a session's close, the state is emitted and
  * removed. This is the standard unbounded-stream sessionizer — no
  * global window, no driver state.
  */
object Sessionize {

  final case class Ev(k: Long, tus: Long, tsm: java.sql.Timestamp)
  final case class Sess(start: Long, last: Long, n: Long)
  final case class SessState(sessions: List[Sess])
  final case class SessOut(user_id: Long, session_start: Long, n: Long)

  /** Merge new event instants into a disjoint, ordered session list.
    * Sessions compress to (start, last, n); an instant is a singleton
    * session; adjacent pieces fuse while the gap is < gapUs. Correct
    * for out-of-order arrivals (a late instant can bridge two
    * sessions — their counts add). */
  private[graft] def mergeSessions(existing: List[Sess],
                                   instants: Seq[Long],
                                   gapUs: Long): List[Sess] = {
    val pieces = (existing ++ instants.map(t => Sess(t, t, 1L)))
      .sortBy(s => (s.start, s.last))
    pieces.foldLeft(List.empty[Sess]) { (acc, s) =>
      acc match {
        case h :: t if s.start - h.last < gapUs =>
          Sess(h.start, math.max(h.last, s.last), h.n + s.n) :: t
        case _ => s :: acc
      }
    }.reverse
  }

  /** Drain `landingDir` (parquet files with columns k: long, tus:
    * long µs) with Trigger.AvailableNow and write completed sessions
    * (user_id, session_start, n) to `outDir`. Sessions flush when the
    * watermark passes their close — the caller makes that happen for
    * ALL sessions by landing a far-future sentinel row as the last
    * file (Spark then runs a no-data micro-batch that fires the
    * event-time timeouts before AvailableNow terminates). */
  def runSessionize(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      checkpointDir: String,
      gapUs: Long,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    import spark.implicits._
    require(gapUs > 0, "runSessionize: gap must be positive")
    val gapMs = gapUs / 1000L
    val schema = spark.read.parquet(landingDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(landingDir)
      .withColumn("tsm", timestamp_micros(col("tus")))
      .withWatermark("tsm", "0 seconds")
      .as[Ev]

    val fn: (Long, Iterator[Ev], GroupState[SessState]) => Iterator[SessOut] =
      (k, it, state) =>
        if (state.hasTimedOut) {
          // Watermark passed every stored session's close (the caller
          // pushed it with the sentinel): emit them all, free the key.
          val out = state.get.sessions.map(s => SessOut(k, s.start, s.n))
          state.remove()
          out.iterator
        } else {
          val merged = mergeSessions(
            state.getOption.map(_.sessions).getOrElse(Nil),
            it.map(_.tus).toSeq, gapUs)
          state.update(SessState(merged))
          val closeMs = merged.map(_.last).max / 1000L + gapMs
          state.setTimeoutTimestamp(
            math.max(closeMs, state.getCurrentWatermarkMs() + 1L))
          Iterator.empty
        }

    val sessions = src.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)

    val query = sessions.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }
}
