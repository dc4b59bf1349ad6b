package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Empirical scale evidence for the COVERAGE.md "scale shape" claims:
  * blow the similarity-family inputs up 10× and show the heavy dedup /
  * ANN queries scale sub-quadratically with no stragglers.
  *
  * The corpus grows by deterministic copies whose texts are PERTURBED
  * per copy — every 2nd word, phase-shifted by copy index, gets a
  * copy-specific suffix — so every w-gram shingle of every copy
  * contains a copy-specific word and copies share NO shingles:
  * corpus growth, not a duplicate explosion. (The round-10 harness
  * perturbed every 8TH word, which still left ~37% of each copy's
  * shingles shared across the whole copy family; at 100× that made
  * every base document a 100-member near-family whose ssjoin
  * candidate pairs grow QUADRATICALLY in the duplication factor —
  * 50M candidate pairs carrying their shingle arrays through the
  * verify join, >77 GB of spill. That is the designed ssjoin response
  * to duplication density, not to corpus size; the every-2nd-word
  * perturbation makes the blow-up measure corpus SCALE instead.)
  * Embedding copies get a small per-copy, per-dimension offset for
  * the same reason.
  *
  * Run: SPARK_GRAFT_SCALE=10 sbt -batch "runMain graft.tools.ScaleProof"
  * Emits one JSON line per query: wall seconds, task count, median /
  * max task ms (straggler check: max ≤ 4× median). Results land in
  * SCALE.md (hand-curated from this output).
  */
object ScaleProof {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale_x$k"
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // shuffle parallelism scales with the data, as it would on a real
    // cluster (sf0.1's 32 is under-partitioned at 100×): multi-wave
    // stages amortize single-wave core contention out of the skew
    // metric, and AQE repacks the finer partitions evenly — measured
    // at 100×, q36's worst stage went bytes-ratio 2.00 (32 parts,
    // AQE packing across reused exchanges) → 1.33 (128 parts), wall
    // 23.9 → 18.9 s
    spark.conf.set("spark.sql.shuffle.partitions",
      (if (k >= 100) 128 else if (k >= 10) 64 else 32).toString)

    // ---- generate the blown-up corpus once ----
    if (!new java.io.File(s"$out/_done").exists()) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      (0 until k).map { i =>
        if (i == 0) docs
        else docs.select(
          (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
          array_join(
            transform(split(col("text"), " "),
              (w, idx) => when((idx + lit(i)) % 2 === 0,
                concat(w, lit(s"v$i"))).otherwise(w)),
            " ").as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .select("doc_id", "text", "lang", "source", "n_chars")
      }.reduce(_ unionByName _)
        // uniform file sizes: the unioned copies otherwise land as
        // ~k variably-sized files, and the SCAN stage's task packing
        // inherits that imbalance (measured bytes-ratio 1.3 at 100×)
        .repartition(math.max(32, 2 * k))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      (0 until k).map { i =>
        if (i == 0) emb
        else emb.select(
          (col("vec_id") + lit(i * maxVec)).as("vec_id"),
          transform(col("embedding"),
            (x, j) => (x + ((j + lit(i * 31)) % 7 - 3).cast("float") *
              lit(0.003f)).cast("float")).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(math.max(32, 2 * k))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      new java.io.File(s"$out/_done").createNewFile()
    }

    // ---- task-duration listener for the straggler check ----
    // skew is judged WITHIN the heaviest stage (by summed task time):
    // a query's global max-task / global median-task mixes trivial
    // bookkeeping stages into the median and reads as fake skew
    // (stageId, duration ms, bytes processed): bytes = input +
    // shuffle-read — duration skew in a SINGLE 32-task wave on 32
    // cores can be pure core contention/GC, so DATA skew is judged on
    // bytes, duration skew on durations, separately
    val durations =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) {
          val bytes = if (e.taskMetrics == null) 0L
            else e.taskMetrics.inputMetrics.bytesRead +
              e.taskMetrics.shuffleReadMetrics.totalBytesRead
          durations.add((e.stageId, e.taskInfo.duration, bytes))
        }
      override def onStageSubmitted(
          e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stageNames.put(e.stageInfo.stageId,
          e.stageInfo.name.replace('"', '\'').takeWhile(_ != '\n'))
    })

    def run(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      durations.clear()
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val byStage = durations.toArray(Array.empty[(Int, Long, Long)])
        .groupBy(_._1).view
        .mapValues(ts => (ts.map(_._2).sorted, ts.map(_._3).sorted)).toMap
      val nTasks = byStage.valuesIterator.map(_._1.length).sum
      val heavy = if (byStage.isEmpty) Array.empty[Long]
        else byStage.values.maxBy(_._1.sum)._1
      val med = if (heavy.isEmpty) 0L else heavy(heavy.length / 2)
      val mx = if (heavy.isEmpty) 0L else heavy.last
      // top stages by summed task time, for per-stage skew attribution
      // (the single heavy-stage number says THAT a query skews, not
      // WHERE — r11 VERDICT #4 needed the stage); bytes_ratio is the
      // DATA-skew verdict, ratio the duration one
      val top = byStage.toSeq.sortBy(-_._2._1.sum).take(4).map {
        case (sid, (ds, bs)) =>
          val m = ds(ds.length / 2)
          val bm = bs(bs.length / 2)
          val nm = stageNames.getOrDefault(sid, "?")
          f"""{"stage":$sid,"name":"$nm","tasks":${ds.length},"sum_ms":${ds.sum},"median_ms":$m,"max_ms":${ds.last},"ratio":${if (m > 0) ds.last.toDouble / m else 0.0}%.2f,"median_bytes":$bm,"max_bytes":${bs.last},"bytes_ratio":${if (bm > 0) bs.last.toDouble / bm else 0.0}%.2f}"""
      }.mkString("[", ",", "]")
      println(f"""{"scale_query":"$label","k":$k,"wall_sec":$wall%.2f,"n_tasks":$nTasks,"heavy_stage_tasks":${heavy.length},"heavy_stage_median_ms":$med,"heavy_stage_max_ms":$mx,"max_over_median":${if (med > 0) mx.toDouble / med else 0.0}%.2f,"top_stages":$top}""")
      graft.Sessions.release(spark)
    }

    // SPARK_GRAFT_SCALE_ONLY=<substring> reruns a subset in a fresh
    // JVM — the Bench --isolate discipline for attributing an
    // in-sequence failure/regression to the query vs session state
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
    def wanted(q: String): Boolean = only.forall(q.contains)
    val registry = Seq("q22_jaccard_join", "q36_dedup_clusters",
      "q49_decontaminate", "q64_containment_cross", "q66_ivfpq_ann")
    registry.filter(wanted).foreach { q =>
      run(q)(graft.SparkEntry.queries(q)(spark, out))
    }
    // the union-find CC kernel legitimately serves even the 100×
    // pair list (pairs scale with duplicates, not corpus) — force
    // the DISTRIBUTED alternating-star rounds so their scale shape
    // stays measured (the 100 TB path for billion-pair dedups)
    if (wanted("q36_dedup_clusters_dist")) {
      spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
      try run("q36_dedup_clusters_dist")(
        graft.SparkEntry.queries("q36_dedup_clusters")(spark, out))
      finally spark.conf.unset("spark.graft.graph.driverGraphBytes")
    }
    // The SERVING configuration with ZERO hand-tuning (r11 VERDICT
    // #2's done-criterion): operator defaults — nLists auto-derived
    // √n at build time, default partial probe. The registry q66 above
    // is the exhaustive-probe correctness extreme (its auto-derivation
    // resolves to the floor list count — partitioning can't prune an
    // exhaustive probe); THIS row is the scale path users actually run.
    if (wanted("q66_ivfpq_serving_defaults")) run("q66_ivfpq_serving_defaults") {
      graft.operators.Similarity.ivfpqTopK(
        graft.queries.Tables.load(spark, out, "embeddings"),
        "vec_id", "embedding", 5)
        .select(col("q"), col("rank"), col("n"))
    }

    // ---- web-archive family: archives ∝ N — REAL per-record gzip
    // WARC members wrapping the blown-up documents' text in HTTP
    // response envelopes + law HTML (entity-escaped), built ONCE and
    // cached like the corpus. The measured pass is the full q159
    // machinery: member walk + inflate + CRC, WARC/HTTP framing, and
    // the codegen html_to_text kernel — the per-partition shape whose
    // 100 TB story is "embarrassingly parallel, zero shuffles":
    // max_over_median on the scan stage IS the claim's test.
    if (!new java.io.File(s"$out/_done_warc").exists()) {
      import spark.implicits._
      spark.read.parquet(s"$out/documents.parquet")
        .select((col("doc_id") / 20).cast("long").as("id"),
          col("doc_id"), col("text"))
        .groupBy("id")
        .agg(collect_list(struct(col("doc_id"), col("text"))).as("docs"))
        .as[(Long, Seq[(Long, String)])]
        .map { case (id, ds) =>
          val bos = new java.io.ByteArrayOutputStream()
          ds.foreach { case (d, t) =>
            val esc = t.replace("&", "&amp;")
              .replace("<", "&lt;").replace(">", "&gt;")
            val html = s"<html><head><title>D$d</title></head>" +
              s"<body><h1>Doc $d</h1><p>$esc</p></body></html>"
            bos.write(graft.operators.Warc.gzipMember(
              graft.operators.Warc.recordBytesRaw("response",
                s"https://scale.example/$d", "2024-01-01T00:00:00Z",
                s"<urn:uuid:$d>",
                graft.operators.Warc.httpResponse(200, "OK",
                  "text/html; charset=utf-8",
                  html.getBytes("UTF-8")))))
          }
          (id, bos.toByteArray)
        }.toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/archives.parquet")
      new java.io.File(s"$out/_done_warc").createNewFile()
    }
    if (wanted("warc_pipeline")) {
      // a real archive lake is 100k × ~1 GB .warc.gz files and the
      // scan splits by file; this corpus is small, so shrink the
      // split size to keep the same tasks-per-byte shape the claim
      // is about (decode parallelism ∝ data, not file count)
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pipeline() = {
        val rec = graft.operators.Warc.extractWarcHttp(
          spark.read.parquet(s"$out/archives.parquet"), "id", "media")
        rec.where(col("status") === 200)
          .select(graft.functions.HtmlToText.htmlToText(col("body")).as("t"))
          .agg(sum(length(col("t"))).as("chars"), count(lit(1)).as("pages"))
      }
      // warm-up: at this corpus size the whole pass is seconds, so a
      // first-wave task paying one-time whole-stage-codegen JIT (~2 s)
      // reads as a fake 50× straggler; compile once untimed, measure
      // the steady state (the 100 TB claim is about the steady state)
      pipeline().collect()
      try run("warc_pipeline")(pipeline())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }

    // ---- training-container family: TFRecord shards ∝ N — REAL
    // double-masked-CRC32C framing + strict tf.Example proto payloads
    // wrapping the blown-up documents (text + law tokens + eighth-
    // quantized embeddings), ~20 examples per shard, built ONCE and
    // cached like the corpus. The measured pass is the full q170
    // machinery: CRC verification over every byte, the canonical-
    // varint proto walk, typed projection, one aggregate — the same
    // "embarrassingly parallel, zero shuffles" 100 TB claim as the
    // archive family, tested by the scan stage's max_over_median.
    if (!new java.io.File(s"$out/_done_tfr").exists()) {
      import spark.implicits._
      spark.read.parquet(s"$out/documents.parquet")
        .select((col("doc_id") / 20).cast("long").as("id"),
          col("doc_id"), col("text"))
        .groupBy("id")
        .agg(collect_list(struct(col("doc_id"), col("text"))).as("docs"))
        .as[(Long, Seq[(Long, String)])]
        .map { case (id, ds) =>
          val recs = ds.map { case (d, t) =>
            graft.operators.TfRecordLake.encExample(Seq(
              "text" -> graft.operators.TfRecordLake.encBytesFeature(
                Seq(t.getBytes("UTF-8"))),
              "tokens" -> graft.operators.TfRecordLake.encInt64Feature(
                (0 until 8).map(j => (d + j) % 997)),
              "embedding" -> graft.operators.TfRecordLake.encFloatFeature(
                (0 until 16).map(j => ((d * 3 + j) % 17).toFloat / 8f)),
              "label" -> graft.operators.TfRecordLake.encInt64Feature(
                Seq(d % 7))))
          }
          (id, graft.operators.TfRecordLake.writeTfRecord(recs))
        }.toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/tfrecords.parquet")
      new java.io.File(s"$out/_done_tfr").createNewFile()
    }
    if (wanted("tfrecord_extract")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = graft.operators.TfRecordLake.extractTfExamples(
          spark.read.parquet(s"$out/tfrecords.parquet"), "id", "media")
        .agg(sum(col("n_tokens")).as("toks"),
          sum(col("emb_sum_x8")).as("emb"),
          count(lit(1)).as("examples"), sum(length(col("text"))).as("chars"))
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("tfrecord_extract")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }

    // ---- bundle-parser family (r12 VERDICT #4): ZIP archives ∝ N —
    // a DIFFERENT walk shape from the warc/tfrecord streaming walks:
    // one central-directory walk per blob followed by N member
    // inflations (nested-blob fan-out), REAL DEFLATE via the JDK's
    // ZipOutputStream (alternating with STORED members) wrapping the
    // blown-up documents, ~20 members per archive, built ONCE and
    // cached like the corpus. The measured pass is the full q164
    // machinery: EOCD backwards scan, central-directory walk,
    // local-header cross-check, Inflater + CRC-32 verification per
    // member, payload stats, one aggregate — same per-partition
    // zero-shuffle 100 TB claim, tested by the scan stage's
    // max_over_median and bytes_ratio.
    if (!new java.io.File(s"$out/_done_zip").exists()) {
      import spark.implicits._
      spark.read.parquet(s"$out/documents.parquet")
        .select((col("doc_id") / 20).cast("long").as("id"),
          col("doc_id"), col("text"))
        .groupBy("id")
        .agg(collect_list(struct(col("doc_id"), col("text"))).as("docs"))
        .as[(Long, Seq[(Long, String)])]
        .map { case (id, ds) =>
          val bos = new java.io.ByteArrayOutputStream()
          val zos = new java.util.zip.ZipOutputStream(bos)
          ds.zipWithIndex.foreach { case ((d, t), k) =>
            val body = t.getBytes("UTF-8")
            val e = new java.util.zip.ZipEntry(s"doc_$d.txt")
            if (k % 2 == 1) { // STORED needs pre-declared size + CRC
              e.setMethod(java.util.zip.ZipOutputStream.STORED)
              e.setSize(body.length)
              e.setCompressedSize(body.length)
              val crc = new java.util.zip.CRC32
              crc.update(body)
              e.setCrc(crc.getValue)
            }
            zos.putNextEntry(e)
            zos.write(body)
            zos.closeEntry()
          }
          zos.close()
          (id, bos.toByteArray)
        }.toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/ziparchives.parquet")
      new java.io.File(s"$out/_done_zip").createNewFile()
    }
    if (wanted("zip_extract")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = graft.operators.ZipLake.extractZip(
          spark.read.parquet(s"$out/ziparchives.parquet"), "id", "media")
        .agg(sum(col("n_words")).as("words"),
          sum(col("digit_sum")).as("digits"),
          sum(col("uncomp_size")).as("bytes"), count(lit(1)).as("entries"))
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("zip_extract")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }

    // ---- compressed-shard family (r13): .jsonl.zst shards ∝ N —
    // the RedPajama/Dolma distribution shape. Builder wraps the
    // blown-up documents ~20/shard as JSONL and zstd-compresses
    // (checksummed frames); the measured pass is the full q195
    // machinery: bounded decompression, line split, from_json,
    // per-document projection, one aggregate. Same zero-shuffle
    // per-partition claim as warc/tfrecord/zip, tested on the scan
    // stage's ratios; the bomb cap rides along on every blob.
    if (!new java.io.File(s"$out/_done_jsonl").exists()) {
      import spark.implicits._
      spark.read.parquet(s"$out/documents.parquet")
        .select((col("doc_id") / 20).cast("long").as("id"),
          col("doc_id"), col("text"), col("lang"))
        .groupBy("id")
        .agg(collect_list(struct(col("doc_id"), col("text"),
          col("lang"))).as("docs"))
        .as[(Long, Seq[(Long, String, String)])]
        .map { case (id, ds) =>
          val jsonl = ds.map { case (d, t, lang) =>
            val esc = t.replace("\\", "\\\\").replace("\"", "\\\"")
              .replace("\n", " ")
            s"""{"doc_id": $d, "lang": "$lang", "text": "$esc"}"""
          }.mkString("\n")
          (id, graft.operators.CompressedLake.compress("zstd",
            jsonl.getBytes("UTF-8")))
        }.toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/jsonlshards.parquet")
      new java.io.File(s"$out/_done_jsonl").createNewFile()
    }
    if (wanted("jsonl_zstd_shards")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = {
        val txt = graft.operators.CompressedLake.extractText(
          spark.read.parquet(s"$out/jsonlshards.parquet"), "id", "media")
        txt.where(col("valid"))
          .select(explode(split(col("text"), "\n")).as("doc"))
          .select(from_json(col("doc"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "doc_id BIGINT, lang STRING, text STRING")).as("j"))
          .agg(count(lit(1)).as("docs"),
            sum(length(col("j.text"))).as("chars"),
            countDistinct(col("j.lang")).as("langs"))
      }
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("jsonl_zstd_shards")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }

    // ---- image near-dup family (r13 VERDICT #4): images ∝ N — the
    // q190 chain end to end: REAL PNG decode (inflate + unfilter) →
    // integer grayscale → 9×8 nearest-neighbor downsample → 64-bit
    // dHash → the SHARED SimHash banded blocking. The fingerprint law
    // keeps near-dup PAIRS ∝ N: groups of three (base / 2-bit flip /
    // 1-bit flip), group bases mixed through splitmix64 so cross-group
    // Hamming-≤3 collisions are birthday-negligible even at 100× —
    // pair growth measures corpus scale, not duplication density.
    // Image sizes cycle 9×8 … 72×64 so the decode stage carries real
    // per-row pixel work. The decode stage is the new claim (zero
    // shuffles, per-partition); the only exchange below it is the
    // band-bucket join the text SimHash path already proved.
    if (!new java.io.File(s"$out/_done_img").exists()) {
      import spark.implicits._
      val nImg = 3000L * k
      spark.range(nImg).repartition(math.max(32, 2 * k)).as[Long]
        .map { r =>
          def mix(z0: Long): Long = {
            var z = z0 + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z ^ (z >>> 31)
          }
          val g = r / 3
          val base = mix(g)
          val bits = (r % 3) match {
            case 0 => base
            case 1 => base ^ (1L << (mix(g * 7 + 1) & 63).toInt) ^
              (1L << (mix(g * 7 + 2) & 63).toInt)
            case _ => base ^ (1L << (mix(g * 7 + 3) & 63).toInt)
          }
          val s = 1 + (r % 8).toInt
          (r, graft.operators.Multimodal.encodeDHashPng(
            (x, y) => ((bits >>> (y * 8 + x)) & 1L) == 1L, s))
        }.toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/images.parquet")
      new java.io.File(s"$out/_done_img").createNewFile()
    }
    if (wanted("image_neardup")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = {
        // decode ONCE: the blocking evaluates its input several times
        // (distinct reps + two id joins + the within join) — free on a
        // fingerprint COLUMN scan, 3× the whole PNG decode here
        // (measured: three equal-sum decode stages at 100×).
        // Fingerprints are 16 B/row, so eager-materialize them; the
        // eager localCheckpoint also hands AQE true sizes (vs cache()'s
        // stats-blind InMemoryRelation — CLAUDE.md Graph.pinner note).
        val fps = graft.operators.Multimodal.imageDHash(
            spark.read.parquet(s"$out/images.parquet"), "id", "media")
          .where(col("valid"))
          .select(col("id"), col("dhash").as("simhash"))
          .localCheckpoint()
        graft.operators.Dedup.simhashNearDup(fps, maxDist = 3)
          .agg(count(lit(1)).as("pairs"), sum(col("hamming")).as("ham_sum"))
      }
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("image_neardup")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }

    // ---- parquet-footer census family (r15): footers ∝ N — the
    // lake-inventory pass a 100 TB estate runs nightly. Blobs are
    // REAL thrift-compact FileMetaData footers (the in-repo writer)
    // with law-driven schema/row-group/chunk shapes, each a few
    // hundred bytes: this family's claim is that a census of
    // MILLIONS of small footers is scan-bound and shuffle-free, the
    // opposite corpus shape from the big-archive families above.
    if (!new java.io.File(s"$out/_done_pqm").exists()) {
      import spark.implicits._
      val nFtr = 3000L * k
      spark.range(nFtr).repartition(math.max(32, 2 * k)).as[Long]
        .map { r =>
          val nLeaves = 2 + (r % 4).toInt
          val nRg = 1 + (r % 3).toInt
          val rgs = (0 until nRg).map { g =>
            graft.operators.ParquetLake.FixRg(100 + r % 50 + g,
              (0 until nLeaves).map { c =>
                val tc = 400L + (r % 97) * 3 + c * 11 + g * 5
                graft.operators.ParquetLake.FixCol(s"c$c",
                  Array(1, 2, 6)((c + g) % 3), Array(0, 1, 6)(c % 3),
                  100 + r % 50 + g, tc, tc + 150,
                  hasDict = (r + c) % 2 == 0)
              })
          }
          (r, graft.operators.ParquetLake.encodeParquetMeta(
            1 + (r % 2).toInt, s"scaleproof ${r % 9}", rgs,
            extraKv = r % 4 == 0, columnOrders = r % 5 == 0,
            stats = r % 3 == 0))
        }.toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/footers.parquet")
      new java.io.File(s"$out/_done_pqm").createNewFile()
    }
    if (wanted("parquet_census")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = graft.operators.ParquetLake.extractParquetMeta(
          spark.read.parquet(s"$out/footers.parquet"), "id", "media")
        .agg(sum(col("n_values")).as("vals"),
          sum(col("total_compressed")).as("bytes"),
          countDistinct(col("codec")).as("codecs"),
          count(lit(1)).as("chunks"))
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("parquet_census")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }

    // ---- config-lake census family (r16): small TEXT configs ∝ N —
    // the metadata layer of a hub crawl (YAML model/dataset cards,
    // CSV shards with unknown dialects). Same corpus shape and claim
    // as the footer census: millions of sub-KB blobs are scan-bound
    // and shuffle-free below the final aggregate; "add executors" is
    // the whole scaling story.
    if (!new java.io.File(s"$out/_done_cfg").exists()) {
      import spark.implicits._
      val nCfg = 3000L * k
      spark.range(nCfg).repartition(math.max(32, 2 * k)).as[Long]
        .map(r => (r, graft.operators.YamlLake.yamlDoc((r % 4096).toInt)))
        .toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/yaml.parquet")
      spark.range(nCfg).repartition(math.max(32, 2 * k)).as[Long]
        .map(r =>
          (r, graft.operators.CsvSniff.csvTypedDoc((r % 4096).toInt)))
        .toDF("id", "text")
        .write.mode("overwrite").parquet(s"$out/csv.parquet")
      new java.io.File(s"$out/_done_cfg").createNewFile()
    }
    if (wanted("yaml_census")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = graft.operators.YamlLake.extractYaml(
          spark.read.parquet(s"$out/yaml.parquet"), "id", "media")
        .agg(sum(col("lval")).as("lsum"),
          countDistinct(col("kind")).as("kinds"),
          count(lit(1)).as("leaves"))
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("yaml_census")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }
    // ---- composed model-card family (r18): the full front-matter
    // walk (fence + flow seqs + block scalar + the depth-6
    // model-index sequence-of-mappings nest) over card-shaped text
    // blobs ∝ N — the hub-metadata corpus the r17 verdict motivated.
    if (!new java.io.File(s"$out/_done_card").exists()) {
      import spark.implicits._
      val nCard = 3000L * k
      spark.range(nCard).repartition(math.max(32, 2 * k)).as[Long]
        .map(r =>
          (r, graft.operators.YamlLake.modelCardDoc((r % 4096).toInt)))
        .toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/card.parquet")
      new java.io.File(s"$out/_done_card").createNewFile()
    }
    if (wanted("card_census")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = graft.operators.YamlLake.extractFrontMatter(
          spark.read.parquet(s"$out/card.parquet"), "id", "media")
        .agg(sum(col("lval")).as("lsum"),
          sum(col("fx100")).as("fsum"),
          countDistinct(col("path")).as("paths"),
          count(lit(1)).as("leaves"))
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("card_census")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }
    // ---- scanned-document family (r17): multi-page TIFFs ∝ N — the
    // digitization-corpus shape (faxes, book scans: small files, a
    // few pages each, mixed per-page compressions incl. the CCITT
    // coders). One blob = one IFD-chain walk, one row per page; the
    // claim is the same as the other censuses: scan-bound,
    // shuffle-free below the final aggregate.
    if (!new java.io.File(s"$out/_done_tiff").exists()) {
      import spark.implicits._
      val nTiff = 3000L * k
      spark.range(nTiff).repartition(math.max(32, 2 * k)).as[Long]
        .map(r =>
          (r, graft.operators.TiffLake.multiPageDoc((r % 4096).toInt)))
        .toDF("id", "media")
        .write.mode("overwrite").parquet(s"$out/tiff.parquet")
      new java.io.File(s"$out/_done_tiff").createNewFile()
    }
    if (wanted("tiff_census")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = graft.operators.TiffLake.extractTiffPages(
          spark.read.parquet(s"$out/tiff.parquet"), "id", "media")
        .agg(sum(col("gray_sum")).as("gsum"),
          countDistinct(col("compression")).as("comps"),
          count(lit(1)).as("pages"))
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("tiff_census")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }
    if (wanted("tiff_pagededup")) {
      // the q241 composition at scale: decode chains → raster sigs →
      // hash-pregrouped exact dedup (Dedup.pageDupGroups). This
      // corpus duplicates each of the 4096 base documents ~N/4096
      // times, so at 100× nearly every page hash-collides and the
      // verify pass carries most signatures — the dup-heavy WORST
      // case for pass 2, by design (growth then measures the exact
      // verify, not a best-case singleton short-circuit).
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = {
        val sigs = graft.operators.TiffLake.extractTiffPageSigs(
          spark.read.parquet(s"$out/tiff.parquet"), "id", "media")
        graft.operators.Dedup.pageDupGroups(sigs,
            graft.operators.TiffLake.MaxPages)
          .agg(sum(col("dup_count")).as("dsum"),
            sum(col("canon_id")).as("csum"),
            count(lit(1)).as("pages"))
      }
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("tiff_pagededup")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }
    if (wanted("csv_census")) {
      val oldSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      def pass() = graft.operators.CsvSniff.extractCsv(
          spark.read.parquet(s"$out/csv.parquet"), "id", "text")
        .agg(sum(col("lsum")).as("vsum"),
          countDistinct(col("kind")).as("kinds"),
          count(lit(1)).as("cols"))
      pass().collect() // untimed codegen warm-up (steady-state claim)
      try run("csv_census")(pass())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
    }

    // ---- graph family (r11 VERDICT #7): edges ∝ N·k, FORCED onto
    // the distributed checkpoint path at every scale (driver kernel
    // and cache path disabled) so the superstep/adjacency machinery
    // itself is what scales. Deterministic hash graph: n = 20k·k
    // nodes, 10 out-edges per node (uniform endpoints — hub handling
    // is separately spec-gated by GraphSpec's probe/wedge tests).
    {
      val nNodes = 20000L * k
      def edges = spark.range(10L * nNodes).select(
        (col("id") % nNodes).as("src"),
        pmod(xxhash64(col("id"), lit(7L)), lit(nNodes)).as("dst"))
      val graphRuns: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        s"graph_pagerank_n$nNodes" -> (() =>
          graft.operators.Graph.pageRankInt(edges, "src", "dst", iters = 5)),
        s"graph_triangles_n$nNodes" -> (() =>
          graft.operators.Graph.triangleCounts(edges, "src", "dst")),
        s"graph_labelprop_n$nNodes" -> (() =>
          graft.operators.Graph.minLabelPropagate(edges, "src", "dst", iters = 4)),
        s"graph_bfs_n$nNodes" -> (() =>
          graft.operators.Graph.bfsHops(edges, "src", "dst",
            source = 0L, maxHops = 6)))
      if (graphRuns.exists(r => wanted(r._1))) {
        spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
        spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
        try graphRuns.filter(r => wanted(r._1)).foreach {
          case (label, body) => run(label)(body())
        } finally {
          spark.conf.unset("spark.graft.graph.driverGraphBytes")
          spark.conf.unset("spark.graft.graph.smallGraphBytes")
        }
      }
    }
    spark.stop()
  }
}
