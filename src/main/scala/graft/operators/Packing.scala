package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing — the step that turns a filtered corpus into
  * fixed-length training sequences: documents are laid end-to-end in
  * id order and the token stream is cut every `budget` tokens
  * (concat-then-chunk, the standard LM pretraining layout; documents
  * may straddle a cut). The assignment is a pure function of the
  * global token prefix sum, which is where the scale trap lives: the
  * naive formulation is `sum(tokens) OVER (ORDER BY id)` — a GLOBAL
  * window, i.e. every row through ONE partition.
  *
  * This implementation is the distributed prefix sum instead:
  *
  *  1. range-repartition + in-partition sort by id (one shuffle —
  *     the only corpus-sized exchange), pinned by an eager
  *     checkpoint so both passes see identical partitions;
  *  2. per-partition token subtotals (narrow pass, ≤ one row per
  *     partition to the driver);
  *  3. driver scan-left over ≤ numPartitions subtotals → broadcast
  *     partition offsets;
  *  4. per-partition cumulative emit (narrow pass).
  *
  * Output per document: token count, global start offset, first/last
  * bin index. Deterministic: the result depends only on (id order,
  * token counts, budget) — never on partition boundaries (the range
  * partitioner's sampled split points shift subtotals and offsets in
  * lockstep). Preconditions: ids UNIQUE (duplicate ids have no
  * defined order, so their individual offsets would be arbitrary)
  * and token counts non-null — a null is rejected up front with a
  * clear error instead of an executor-deep NPE. */
object Packing {

  def sequencePack(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val sorted = df
      .select(col(idCol).cast(LongType).as("id"),
        col(tokensCol).cast(LongType).as("toks"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .localCheckpoint(eager = true) // pin partitioning across passes
    val subtotals = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        // duplicate detection is complete here: the range partitioner
        // sends equal ids to one partition and the in-partition sort
        // makes them adjacent — a dup would get arbitrary
        // (partition-order-dependent) per-row offsets, so fail loudly
        var prev = Long.MinValue
        var first = true
        it.foreach { r =>
          require(!r.isNullAt(1), "sequencePack: null token count for id " +
            (if (r.isNullAt(0)) "<null>" else r.getLong(0).toString))
          require(!r.isNullAt(0),
            "sequencePack: null id — ids must be unique and non-null")
          val id = r.getLong(0)
          require(first || id != prev,
            s"sequencePack: duplicate id $id — ids must be unique " +
              "(offsets among duplicates would be partition-dependent)")
          prev = id
          first = false
          s += r.getLong(1)
        }
        Iterator.single((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _)
    val offB = spark.sparkContext.broadcast(offsets)
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offB.value(pid)
      it.map { r =>
        val start = cum
        cum += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), start)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
        StructField("id", LongType, false),
        StructField("n_tokens", LongType, false),
        StructField("start_tok", LongType, false))))
      // integer `div`, not `/`: bins are exact long arithmetic (an
      // empty document occupies no tokens but still lands in the bin
      // at its offset — greatest(toks, 1) keeps first == last there)
      .withColumn("bin_first", expr(s"start_tok div ${budget}L"))
      .withColumn("bin_last",
        expr(s"(start_tok + greatest(n_tokens, 1L) - 1L) div ${budget}L"))
  }
}
