package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.ingest.{Ingest, Pipeline}

/** Streaming ingest — the reference's event-driven shape (O1/O21,
  * SURVEY.md §3 EP1) on Structured Streaming:
  *
  *  - GCS `object.finalize` events → a streaming file source over the
  *    landing prefix (each new file is one event, exactly like the
  *    reference's per-object trigger);
  *  - the per-event "is the folder complete now?" check
  *    (`main.py:43-47`) → [[completenessGate]], a
  *    `flatMapGroupsWithState` keyed by acquisition dir that keeps
  *    the seen-file set in state and emits each dir exactly once,
  *    when the required set is present;
  *  - the decode/enrich/RMS/sink pipeline runs per emitted dir in
  *    `foreachBatch` — the same batch code (`Pipeline`), so batch and
  *    streaming share one implementation.
  *
  * State is bounded: one small Set[String] per in-flight acquisition,
  * dropped on emission; abandoned uploads can be expired with a
  * processing-time timeout (the reference leaks nothing only because
  * it re-lists per event — same at-least-once semantics).
  */
object StreamingIngest {

  final case class FileEvent(dir: String, name: String)
  final case class GateState(seen: Set[String], emitted: Boolean)

  /** Stateful completeness gate: emits each acquisition dir once,
    * in the micro-batch where its required file set completes. */
  def completenessGate(
      events: Dataset[FileEvent],
      required: Set[String] = Ingest.RequiredFiles,
      stateTimeout: Option[Long] = None): Dataset[String] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (stateTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(_.dir)
      .flatMapGroupsWithState[GateState, String](
        OutputMode.Append, timeoutConf) {
        case (dir, evs, state: GroupState[GateState]) =>
          if (state.hasTimedOut) { // abandoned upload: drop state
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(GateState(Set.empty, emitted = false))
            val seen = prev.seen ++ evs.map(_.name.toLowerCase)
            val complete = required.subsetOf(seen)
            if (prev.emitted || !complete) {
              state.update(GateState(seen, prev.emitted))
              stateTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            } else {
              state.update(GateState(seen, emitted = true))
              // emitted entries must still expire, else state for
              // finished uploads accumulates forever
              stateTimeout.foreach(state.setTimeoutDuration)
              Iterator.single(dir)
            }
          }
      }
  }

  /** File events from a landing prefix: one row per newly-seen file,
    * keyed by its acquisition dir. `latestFirst`/maxFilesPerTrigger
    * stay at defaults; only paths are read here (content is re-read
    * by the decode with proper splitting). */
  def fileEvents(spark: SparkSession, landingDir: String): Dataset[FileEvent] = {
    import spark.implicits._
    spark.readStream
      .format("binaryFile")
      .option("pathGlobFilter", "*")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(s"$landingDir/*")
      .select(col("path"))
      .as[String]
      .map { p =>
        val slash = p.lastIndexOf('/')
        FileEvent(p.substring(0, slash), p.substring(slash + 1))
      }
  }

  /** End-to-end streaming pipeline: landing prefix → gate → batch
    * pipeline per complete acquisition. `Trigger.AvailableNow`
    * processes the backlog and stops — the driver-friendly mode; pass
    * a different trigger for continuous tailing. */
  def run(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): Unit = {
    val complete = completenessGate(fileEvents(spark, landingDir))
    val query = complete.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[String], _: Long) =>
        // tiny driver-side loop: one pipeline submission per newly
        // complete acquisition (the heavy work is cluster-parallel
        // inside Pipeline)
        batch.collect().foreach { dir =>
          Pipeline.processAcquisition(spark, dir, outDir)
        }
      }
      .start()
    query.awaitTermination()
  }

  /** Streaming exact dedup: drop repeats of a key seen within the
    * watermark horizon — the streaming member of the dedup family
    * (state is bounded by the watermark, unlike plain dropDuplicates
    * whose state grows forever). */
  def streamingDedup(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming substring-level decontamination: corpus documents
    * arrive as parquet files under `landingDir`; each micro-batch is
    * scrubbed against a FIXED eval set ([[graft.operators.Dedup
    * .decontaminateSubstringAgainst]]) and survivors append to
    * `outDir` — eval-leak removal as a continuous ingest pass instead
    * of a corpus-wide batch job. The eval set's distinct window
    * fingerprints are computed ONCE up front and checkpointed; every
    * micro-batch reuses that (small, broadcast-able) frame, so the
    * per-batch cost is one narrow fingerprint pass over the batch +
    * one semi-join. Soundness note: substring decontamination is
    * per-document against the fixed eval side, so batch boundaries
    * cannot change the result — streaming the corpus in ANY split
    * yields exactly the batch answer (q59 gates this against q55's
    * oracle). `Trigger.AvailableNow` drains the backlog and stops;
    * pass a different trigger for continuous tailing. */
  /** STREAMING heavy-hitter accumulation: each micro-batch reduces to
    * one Count-Min-sketch row (depth×width cells, ~KBs — the batch's
    * rows never leave the executors), landed under a `batch_id=`
    * partition with dynamic overwrite, so an at-least-once replay
    * overwrites exactly its own partial and the accumulated state is
    * effectively exactly-once (the q59 sink discipline). Because CMS
    * merge is cell-wise addition, the post-stream merge of the
    * per-batch partials is BYTE-IDENTICAL to a single batch pass over
    * the same rows — how the batches happened to split the stream is
    * invisible (gated by SketchPropertySpec).
    *
    * This is the serving shape for "top keys over an unbounded
    * stream": bounded state per batch, history kept as mergeable
    * partials, any window of batches answerable by merging its
    * partials. [[finishHeavyHitters]] is the exact-verify read side. */
  def runHeavyHittersSketch(
      spark: SparkSession,
      landingDir: String,
      keyCol: String,
      sketchDir: String,
      checkpointDir: String,
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val inferred = schema.getOrElse(spark.read.parquet(landingDir).schema)
    val reader = spark.readStream.schema(inferred)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val query = reader.parquet(landingDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sketchBatch(batch, keyCol, eps, confidence, seed, sketchDir, batchId)
      }
      .start()
    query.awaitTermination()
  }

  private[graft] def sketchBatch(
      batch: DataFrame,
      keyCol: String,
      eps: Double,
      confidence: Double,
      seed: Int,
      sketchDir: String,
      batchId: Long): Unit =
    batch
      .select(count_min_sketch(xxhash64(col(keyCol)), lit(eps),
        lit(confidence), lit(seed)).as("cms"))
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(sketchDir)

  /** Read side of the streaming heavy hitters: merge the per-batch
    * sketch partials, then run the sound prefilter + exact verify
    * over the landed corpus ([[graft.operators.HeavyHitters]]).
    * Oracle-exact: output = the naive groupBy/HAVING over everything
    * the stream landed. */
  def finishHeavyHitters(
      spark: SparkSession,
      landingDir: String,
      sketchDir: String,
      keyCol: String,
      threshold: Long): DataFrame = {
    val partials = spark.read.parquet(sketchDir)
      .select("cms").collect().map(_.getAs[Array[Byte]](0)).toSeq
    val merged = graft.operators.HeavyHitters.mergeSketches(partials)
    graft.operators.HeavyHitters
      .verifyWithSketch(spark.read.parquet(landingDir), keyCol, threshold,
        merged)
  }

  /** STREAMING exactly-once deduplication: `dropDuplicatesWithinWatermark`
    * keys the state by `keyCols` and expires it once the event-time
    * watermark passes — the BOUNDED-STATE streaming dedup (plain
    * dropDuplicates would grow state forever on an unbounded stream).
    * Semantics contract: duplicates arriving within the watermark of
    * their first occurrence are dropped; the batch equivalent is
    * DISTINCT-by-key whenever duplicate occurrences share (or
    * closely trail) the original's event time. Survivors land under
    * batch_id= partitions (the q59 exactly-once discipline).
    * `tsCol` must be a TimestampType event-time column. */
  // format: keep runEnrichStream adjacent to the other run* entry points

  /** STREAM-STATIC broadcast enrichment — the at-ingest dimension
    * lookup every event pipeline runs (attach segment/geo/account
    * attributes as rows arrive). The static side is hint-broadcast,
    * so each micro-batch is a stateless map-side hash join: NO
    * streaming state, no watermark, nothing to evict — the one
    * streaming join shape that scales with the dimension held in
    * memory per executor rather than in the state store (contrast
    * q88's two-sided stream-stream state). Inner join semantics:
    * events missing a dimension row are dropped (the batch
    * equivalent is the plain inner equi-join). Enriched rows land
    * under batch_id= partitions (q59 exactly-once discipline:
    * at-least-once replays overwrite their own partition). */
  def runEnrichStream(
      spark: SparkSession,
      landingDir: String,
      dim: DataFrame,
      joinKeys: Seq[String],
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val inferred = schema.getOrElse(spark.read.parquet(landingDir).schema)
    val reader = spark.readStream.schema(inferred)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val query = reader.parquet(landingDir)
      .join(org.apache.spark.sql.functions.broadcast(dim), joinKeys)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write
          .partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(outDir)
      }
      .start()
    query.awaitTermination()
  }

  def runDedupStream(
      spark: SparkSession,
      landingDir: String,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val inferred = schema.getOrElse(spark.read.parquet(landingDir).schema)
    val reader = spark.readStream.schema(inferred)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val query = reader.parquet(landingDir)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write
          .partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(outDir)
      }
      .start()
    query.awaitTermination()
  }

  def runDecontaminateSubstring(
      spark: SparkSession,
      landingDir: String,
      contam: DataFrame,
      idCol: String,
      textCol: String,
      outDir: String,
      checkpointDir: String,
      windowTokens: Int = 50,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val contamFps = graft.operators.Dedup
      .contamFingerprints(contam, idCol, textCol, windowTokens)
      .localCheckpoint(eager = true)
    // continuous-tailing callers starting BEFORE the first file lands
    // must pass `schema` explicitly — batch inference over an empty
    // landing dir cannot work
    val inferred = schema.getOrElse(spark.read.parquet(landingDir).schema)
    val reader = spark.readStream.schema(inferred)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val query = reader.parquet(landingDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decontamBatch(batch, contamFps, idCol, textCol, windowTokens,
          outDir, batchId)
      }
      .start()
    query.awaitTermination()
  }

  /** One micro-batch of the streaming decontamination, written
    * IDEMPOTENTLY: foreachBatch is at-least-once across failure
    * replays, so a plain append would duplicate a batch's survivors
    * if the batch reruns after a crash-before-checkpoint. Survivors
    * land under a `batch_id=` partition with DYNAMIC partition
    * overwrite — a replayed batch overwrites exactly its own
    * partition, leaving every other batch untouched ⇒ effective
    * exactly-once regardless of replays. */
  private[graft] def decontamBatch(
      batch: DataFrame,
      contamFps: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      outDir: String,
      batchId: Long): Unit =
    graft.operators.Dedup
      .decontaminateSubstringAgainst(batch, contamFps, idCol, textCol,
        windowTokens)
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(outDir)

  /** Streaming tumbling-window RMS with watermarked late-data
    * handling — the reference's RMS table as a live query
    * (SURVEY.md §2.B watermarks). Input: event-time timestamp col +
    * axis columns; output per closed window: rms per axis + rms_mod.
    * Append mode: a window emits once its watermark passes. */
  def streamingRms(
      df: DataFrame,
      tsCol: String,
      axes: Seq[String],
      windowLen: String = "1 second",
      watermark: String = "5 seconds"): DataFrame = {
    val msq = axes.map(a => avg(pow(col(a), 2)).as(s"__msq_$a"))
    val agg = df
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(msq.head, msq.tail: _*)
    val rmsCols = axes.map(a => sqrt(col(s"__msq_$a")).as(s"rms_$a"))
    agg.select(
      (col("window.start").as("Time") +: rmsCols) :+
        sqrt(axes.map(a => col(s"__msq_$a")).reduce(_ + _)).as("rms_mod"): _*)
  }
}
