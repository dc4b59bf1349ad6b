package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Table statistics builders — the summaries a cost-based optimizer
  * or zone-map pruner derives from a table (SURVEY.md §4.2's "design
  * for the planner" posture, reference main.py's role as a curated
  * table producer). */
object Stats {

  /** EXACT equi-depth (equi-height) histogram: `buckets` bins over a
    * total order, sizes differing by at most one row (larger bins
    * first — SQL NTILE semantics), with each bin's true row count and
    * min/max value. The classic CBO/statistics artifact: selectivity
    * estimates and zone-map style range pruning both read it.
    *
    * The naive formulation is `ntile(B) OVER (ORDER BY v)` — a GLOBAL
    * window that funnels the whole table through ONE partition. This
    * is the distributed prefix sum instead (the sequencePack
    * pattern): range-repartition + in-partition sort on the total
    * order (v, id) — the one table-sized exchange — then
    * per-partition counts to the driver (≤ one long per partition), a
    * scan-left into partition rank offsets, and a narrow pass that
    * turns global rank into the NTILE bucket in closed form. Bucket
    * aggregation then shuffles only (bucket, v) pairs.
    *
    * Deterministic: rank is defined by the total order (v, id), never
    * by partition boundaries (sampled split points shift subtotals
    * and offsets in lockstep); rows tied on the FULL key are
    * interchangeable, so bucket counts and min/max are invariant.
    * NULL values are excluded up front (engines disagree on NULL
    * ordering; a histogram of values has no NULL bin).
    */
  def equiDepthHistogram(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      s"equiDepthHistogram: buckets in [1, 2^20], got $buckets")
    val spark = df.sparkSession
    val sorted = df
      .where(col(valueCol).isNotNull)
      .select(col(valueCol).cast(DoubleType).as("v"),
        col(idCol).cast(LongType).as("id"))
      .repartitionByRange(col("v"), col("id"))
      .sortWithinPartitions("v", "id")
      .localCheckpoint(eager = true) // pin partitioning across passes
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single((pid, it.size.toLong))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    require(total > 0, "equiDepthHistogram: no non-null values")
    val b = buckets.toLong
    val offB = spark.sparkContext.broadcast(offsets)
    val bucketed = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      // NTILE in closed form over the global rank: the first
      // (total mod B) buckets hold ceil(total/B) rows, the rest
      // floor(total/B) — integer arithmetic only
      val floorSz = total / b
      val rem = total % b
      var rank = offB.value(pid)
      it.map { row =>
        val bucket =
          if (rank < rem * (floorSz + 1)) rank / (floorSz + 1)
          else rem + (rank - rem * (floorSz + 1)) / floorSz
        rank += 1
        Row(bucket + 1, row.getDouble(0)) // NTILE is 1-based
      }
    }
    spark.createDataFrame(bucketed, StructType(Seq(
        StructField("bucket", LongType, nullable = false),
        StructField("v", DoubleType, nullable = false))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
  }

  /** Zone map: per storage zone (a partition / z-order bucket / file
    * id), row count and min/max of each listed column — the skipping
    * metadata parquet keeps per row group and lakehouse formats keep
    * per file, materialized as a queryable table. One narrow
    * aggregation; columns land as `<c>_min` / `<c>_max`.
    */
  /** Per-group Gini concentration index of a non-negative integer
    * measure (how unequally tokens/bytes/revenue spread across a
    * group's members) — the sorted-rank formulation
    *
    *   G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx),   x₍₁₎ ≤ … ≤ x₍ₙ₎
    *
    * computed entirely in exact integer arithmetic: ranks come from a
    * per-group window (ties broken by the caller's tie column —
    * deterministic), numerator and denominator are DECIMAL(38,0)
    * sums, and the single final division is the only double. Groups
    * with Σx = 0 are dropped (undefined index). One hash exchange +
    * one in-partition sort shared by the rank and the aggregate. */
  def giniIndex(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("_x"), col(tieCol))
    df.select(col(groupCol), col(tieCol),
        col(valueCol).cast("decimal(38,0)").as("_x"))
      .withColumn("_i", row_number().over(w).cast("decimal(38,0)"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_x")).as("_sx"),
        sum(col("_i") * col("_x")).as("_six"))
      .where(col("_sx") > 0)
      .select(col(groupCol), col("_n").cast("long").as("n"),
        col("_sx").cast("long").as("total"),
        ((lit(2) * col("_six") - (col("_n") + lit(1)) * col("_sx"))
          .cast("double")
          / (col("_n") * col("_sx")).cast("double")).as("gini"))
  }

  def zoneMap(df: DataFrame, zoneCol: String,
              cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zoneMap: at least one stats column")
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("n") +: cols.flatMap(c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.groupBy(col(zoneCol).as("zone")).agg(aggs.head, aggs.tail: _*)
  }

  /** Zone-map range pruning: answer `lo ≤ col ≤ hi` by first
    * selecting the zones whose [min, max] interval intersects the
    * range (a zone-map scan — tiny), then reading ONLY those zones
    * and applying the exact residual filter. EXACT output: the zone
    * cut is a superset (any qualifying row's zone interval must
    * intersect the range), and the residual filter removes the rest.
    * At table scale the semi-join on the zone key is what a reader
    * turns into partition/file skipping — the query never touches
    * non-intersecting zones.
    */
  def pruneByZoneMap(df: DataFrame, zm: DataFrame, zoneCol: String,
                     valueCol: String, lo: Long, hi: Long): DataFrame = {
    val zones = zm.where(col(s"${valueCol}_min") <= hi &&
        col(s"${valueCol}_max") >= lo)
      .select(col("zone").as(zoneCol))
    df.join(zones, Seq(zoneCol), "left_semi")
      .where(col(valueCol) >= lo && col(valueCol) <= hi)
      // the semi-join hoists the zone key to the front — restore the
      // caller's column order (prune must be schema-transparent)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
