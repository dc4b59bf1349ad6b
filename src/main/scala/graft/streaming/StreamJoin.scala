package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-STREAM interval join (SURVEY.md §2.B streaming): two live
  * sources joined on an equality key plus an event-time range — the
  * "purchase within an hour of the view" correlation that batch q18
  * computes, running incrementally with join state on BOTH sides.
  *
  * Scale/state shape: Spark co-partitions both streams on the join
  * key and buffers each side in the state store; the event-time range
  * condition plus the watermark bound state eviction — a side's row
  * can be dropped once the watermark passes its time plus the join
  * tolerance. Here the drain contract (AvailableNow over a bounded
  * landing set, watermark delay ≥ the data span) keeps every row
  * joinable, so streamed output ≡ the batch join row-for-row — which
  * is exactly what the oracle checks.
  */
object StreamJoin {

  /** Join `landingA` (user_id, aid, atus) × `landingB` (user_id, bid,
    * btus) on user_id with btus ∈ (atus, atus + maxGapUs]; append
    * matched (user_id, aid, bid) rows to `outDir` as parquet. */
  def runIntervalJoin(
      spark: SparkSession,
      landingA: String,
      landingB: String,
      outDir: String,
      checkpointDir: String,
      maxGapUs: Long,
      watermarkDelay: String = "30 days"): Unit = {
    require(maxGapUs > 0, "runIntervalJoin: maxGapUs must be positive")
    val schemaA = spark.read.parquet(landingA).schema
    val schemaB = spark.read.parquet(landingB).schema
    val a = spark.readStream.schema(schemaA).parquet(landingA)
      .withColumn("ta", timestamp_micros(col("atus")))
      .withWatermark("ta", watermarkDelay)
    val b = spark.readStream.schema(schemaB).parquet(landingB)
      .withColumnRenamed("user_id", "user_id_b")
      .withColumn("tb", timestamp_micros(col("btus")))
      .withWatermark("tb", watermarkDelay)
    // The event-time bound (ta/tb) lets the state store evict; the
    // exact µs bound (atus/btus) pins the join predicate to the same
    // integer comparisons the batch oracle runs.
    val pairs = a.join(b, expr(
        s"""user_id = user_id_b
            AND tb > ta AND tb <= ta + INTERVAL $maxGapUs MICROSECOND
            AND btus > atus AND btus - atus <= $maxGapUs"""))
      .select(col("user_id"), col("aid"), col("bid"))
    pairs.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }
}
