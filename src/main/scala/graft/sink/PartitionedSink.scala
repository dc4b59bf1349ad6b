package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hive-partitioned Parquet sink with the reference's physical-format
  * choices (reference O11+O12, `main.py:107-131`):
  *
  *  - layout `alias=…/year=…/month=…/day=…` — the reference's
  *    hand-built path keys (`main.py:124-131`), with one DELIBERATE
  *    divergence: the reference derives year/month/day from the
  *    acquisition START date (all of an acquisition's files land in
  *    one dir even across midnight), while this sink partitions each
  *    ROW by its own timestamp — so a day-partition holds exactly
  *    that day's data and pruning on any of the four keys is exact;
  *  - Snappy compression, Parquet data-page v2, dictionary encoding
  *    enabled only for `alias` (`main.py:112-118`: the reference pins
  *    DELTA_BINARY_PACKED on Time and dictionary only on alias; with
  *    page v2 + dictionary off, parquet-mr picks DELTA_BINARY_PACKED
  *    for int64 Time automatically — same bytes-on-disk encoding
  *    family without a custom OutputWriter);
  *  - idempotent re-runs via dynamic partition overwrite (the
  *    reference's deterministic object names, `main.py:124-131`).
  *
  * Partition values derive from the epoch-ns `Time` column in UTC.
  */
object PartitionedSink {

  /** @param filesPerDir cap output files per partition directory by
    *   repartitioning on (partition cols, hash-salt) before the
    *   write. Without it every upstream task writes one file into
    *   every partition dir it touches — at 100 TB (~16k decode tasks)
    *   that is a small-files catastrophe. One shuffle buys a bounded
    *   layout; 0 disables (keeps task-parallel writes for tiny jobs).
    * @param filePrefix when set, rename each partition directory's
    *   committed `part-*` files to `<prefix>_00000.parquet, …`
    *   (name-sorted, so stable across identical re-runs) — the
    *   reference's deterministic object names
    *   (`iis3dwb_acc_${"{yyyymmdd_HHMMSS}"}.parquet`, main.py:124-131).
    *   A post-commit metadata pass: one driver-side recursive listing
    *   plus a rename per file — O(1) on HDFS-like stores; on
    *   copy-on-rename object stores prefer the default (None), where
    *   idempotency comes from dynamic partition overwrite alone.
    */
  /** @param renameScope when non-empty, the post-commit rename pass
    *   walks ONLY `alias=<value>` subtrees for these alias values.
    *   CONCURRENT writers to one table root (the reference's ≤6
    *   function instances) MUST scope to their own alias: an unscoped
    *   walk renames a sibling writer's freshly committed part files
    *   while that writer is still reading them back (observed as
    *   FILE_NOT_EXIST in its RMS read). Empty = whole tree
    *   (single-writer mode).
    * @param inputPartitions caller-declared partition count of `df`,
    *   used by the shuffle-skip gate. Callers that know their input's
    *   task count driver-side (the decode path knows its split count
    *   — [[graft.ingest.Ingest.decodeSplitCount]]) should pass it:
    *   the `df.rdd.getNumPartitions` fallback finalizes the physical
    *   plan, and under AQE that can eagerly materialize upstream
    *   exchange stages whose output the write does not reuse —
    *   harmless on the shuffle-free ingest path, double work for any
    *   caller whose input plan contains an exchange.
    * @param format `"PARQUET"` (default), `"CSV"` or `"TSV"`
    *   (case-insensitive) — the export modes the reference's
    *   `convert_dat_to_xsv` name promises (`main.py:75-81` only ever
    *   invokes `file_format="PARQUET"`, but the `xsv` surface exists;
    *   this closes it). CSV/TSV writes carry a header row, the same
    *   Hive partition layout, dynamic-partition-overwrite idempotency
    *   and deterministic-name pass; the parquet-specific physical
    *   options (page v2, dictionary pinning) do not apply.
    */
  def write(
      df: DataFrame,
      outDir: String,
      timeCol: String = "Time",
      filesPerDir: Int = 32,
      filePrefix: Option[String] = None,
      renameScope: Seq[String] = Nil,
      inputPartitions: Option[Int] = None,
      format: String = "PARQUET"): Unit = {
    val fmt = format.toUpperCase
    require(Set("PARQUET", "CSV", "TSV")(fmt),
      s"format must be PARQUET, CSV or TSV, got '$format'")
    // integer `div`, NOT `/`: double division of epoch-ns longs loses
    // precision above 2^53 (ulp ≈ 256 ns at 2025 epochs), which can
    // drop a row within ~1 µs of midnight into the wrong day dir
    val ts = timestamp_micros(expr(s"CAST(`$timeCol` AS BIGINT) div 1000"))
    val withParts = df.withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
    // The salt repartition exists to BOUND files/dir when the input
    // has many partitions (the 100 TB small-files problem: ~16k
    // decode tasks each touching every dir). When the input already
    // has ≤ filesPerDir partitions the bound holds for free — each
    // task writes at most one file per directory — so the full-data
    // shuffle is pure cost and is skipped. A single acquisition's
    // 32-split decode therefore streams straight from decode into
    // the writer (measured: the shuffle was ~25% of the warm ingest
    // pipeline), and time-contiguous input tasks additionally leave
    // tighter Time min/max per file for zone-map-style readers.
    val arranged =
      if (filesPerDir <= 0 ||
          inputPartitions.getOrElse(df.rdd.getNumPartitions) <= filesPerDir)
        withParts
      else withParts.repartition(
        col("alias"), col("year"), col("month"), col("day"),
        pmod(xxhash64(col(timeCol)), lit(filesPerDir.toLong)))
    val writer = arranged
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("alias", "year", "month", "day")
    fmt match {
      case "PARQUET" =>
        writer
          .option("compression", "snappy")
          .option("parquet.writer.version", "v2")
          .option("parquet.enable.dictionary", "false")
          .option("parquet.enable.dictionary#alias", "true")
          .parquet(outDir)
      case "CSV" | "TSV" =>
        writer
          .option("header", "true")
          .option("sep", if (fmt == "TSV") "\t" else ",")
          .csv(outDir)
    }
    val ext = if (fmt == "PARQUET") ".parquet"
      else if (fmt == "TSV") ".tsv" else ".csv"
    filePrefix.foreach { p =>
      val roots =
        if (renameScope.isEmpty) Seq(outDir)
        else renameScope.map(a => s"$outDir/alias=$a")
      roots.foreach(r => deterministicNames(df, r, p, ext))
      // the renames happen underneath any listing this session may
      // have cached for the path (FileStatusCache) — a later reader
      // would list the old part-* names and die with FILE_NOT_EXIST;
      // drop the stale entries now that the layout is final
      df.sparkSession.catalog.refreshByPath(outDir)
    }
  }

  /** Rename committed part files to `<prefix>_NNNNN.parquet` per
    * partition directory. Sort key is the committed name (task
    * partition index), deterministic for a deterministic plan;
    * dynamic partition overwrite clears a rewritten partition before
    * commit, so a directory this write touched holds ONLY fresh
    * `part-*` files. Directories with any other content (untouched
    * partitions already normalized, or a concurrent writer's output)
    * are left alone, and a rename lost to a concurrent normalizer is
    * skipped, not fatal — content is identical either way. */
  private def deterministicNames(
      df: DataFrame, outDir: String, prefix: String,
      ext: String = ".parquet"): Unit = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.Path]
    // manual walk, not listFiles(recursive): skips hidden/staging
    // trees (.spark-staging-*, _temporary) a CONCURRENT writer may be
    // committing — their entries vanish mid-iteration — and tolerates
    // directories deleted underneath us. Committed data files match
    // on the WRITER's extension (Spark emits `.csv` for both CSV and
    // TSV — the separator is an option, not a suffix); the rename
    // target carries the caller-facing `ext`.
    def walk(dir: org.apache.hadoop.fs.Path): Unit = {
      val statuses =
        try fs.listStatus(dir)
        catch { case _: java.io.FileNotFoundException => return }
      statuses.foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith(".") && !name.startsWith("_")) {
          if (st.isDirectory) walk(st.getPath)
          else if (name.endsWith(".parquet") || name.endsWith(".csv"))
            files += st.getPath
        }
      }
    }
    walk(root)
    files.groupBy(_.getParent).foreach { case (dir, fl) =>
      if (fl.forall(_.getName.startsWith("part-"))) {
        fl.sortBy(_.getName).zipWithIndex.foreach { case (src, i) =>
          val dst = new org.apache.hadoop.fs.Path(dir, f"${prefix}_$i%05d$ext")
          if (fs.exists(src) && !fs.exists(dst)) fs.rename(src, dst)
        }
      }
    }
  }
}
