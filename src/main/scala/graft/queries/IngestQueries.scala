package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.AcquisitionFixture
import graft.ingest.{Ingest, Pipeline}

/** Ingest-side queries (SURVEY.md §2.C Q10): HSD2 binary decode and
  * the full acquisition pipeline, driven off a deterministic synthetic
  * fixture (FIXTURES.md §1).
  *
  * Oracle strategy: the fixture is CLOSED-FORM — sample j (1-based)
  * of the default Spec is fully determined by j through exact IEEE
  * double arithmetic (block-timestamp interpolation, half-even
  * quantization, sensitivity scaling), so DuckDB can regenerate the
  * expected output from `range(1, 93001)` with the same operation
  * order and compare hash-exactly. The only libm call is sin(); Java
  * Math.sin and DuckDB's sin differ by 1 ulp on ~0.2% of the 93 000
  * fixture arguments, but NEVER at a half-even quantization boundary
  * (verified exhaustively), so the quantized values agree exactly.
  */
object IngestQueries {

  /** WITH-prelude regenerating the default fixture's decoded samples
    * (AcquisitionFixture.Spec(): odr=26667, spts=1000, 93 blocks,
    * sens=0.000488, 50 Hz sine, start 2025-07-11T16:22:17Z). Mirrors
    * Hsd2.decodeBlocks' interpolation (last sample EXACTLY on the
    * block timestamp) and Ingest.enrich's bround(t*1e9)+startNs. */
  private val fixtureSamplesSql: String =
    """WITH tt AS (
         SELECT j, (j-1)%1000 AS i0,
           CAST(((j-1)//1000)*1000 AS DOUBLE)/26667.0 AS t0,
           CAST(((j-1)//1000+1)*1000 AS DOUBLE)/26667.0 AS t1
         FROM range(1, 93001) r(j)),
       sm AS (
         SELECT j,
           CASE WHEN i0 = 999 THEN t1
                ELSE t0 + (CAST(i0+1 AS DOUBLE) * (t1 - t0)) / 1000.0
           END AS t
         FROM tt),
       vals AS (
         SELECT j, t,
           CAST(round_even(t * 1e9, 0) AS BIGINT)
             + 1752250937000000000 AS time_ns,
           CAST(CAST(round_even(1.0/0.000488, 0) AS BIGINT) AS DOUBLE)
             * 0.000488 AS vx,
           -- BIGINT round-trip mirrors the engine's int16 raw value:
           -- it drops round_even's IEEE -0.0 sign (0.toDouble = +0.0)
           CAST(CAST(round_even(sin((2*pi()*50.0)
                  * (CAST(j AS DOUBLE)/26667.0)) / 0.000488, 0)
                AS BIGINT) AS DOUBLE) * 0.000488 AS vy,
           CAST(0 AS DOUBLE) AS vz
         FROM sm)"""

  private val lock = new Object
  @volatile private var fixtureDir: String = _

  /** Deterministic fixture shared across queries (generated once per
    * JVM; content depends only on the Spec constants). */
  private def fixture(): String = lock.synchronized {
    if (fixtureDir == null) {
      val d = java.nio.file.Files.createTempDirectory("graft_fixture").toString
      AcquisitionFixture.write(s"$d/LAF1_fixture", AcquisitionFixture.Spec())
      fixtureDir = s"$d/LAF1_fixture"
    }
    fixtureDir
  }

  /** q10: gate → distributed decode → enrich; output = enriched
    * time-series (Time epoch-ns, A_x_g/A_y_g/A_z_g, alias). */
  def q10(s: SparkSession, dir: String): DataFrame =
    Ingest.convertAcquisition(s, fixture()).get.orderBy("Time")

  /** q20: the fused RMS aggregate over the same fixture
    * (1-s tumbling, 0.999 completeness — reference defaults). */
  def q20(s: SparkSession, dir: String): DataFrame = {
    val enriched = Ingest.convertAcquisition(s, fixture()).get
    graft.analytics.Rms.compute(enriched,
        axes = Seq("A_x_g", "A_y_g", "A_z_g"), alias = "LAF1")
      .orderBy("Time")
  }

  /** q35: the DataSource V2 `hsd` format with column pruning + Time
    * pushdown — same fixture, pruned projection over a pushed range. */
  def q35(s: SparkSession, dir: String): DataFrame =
    s.read.format("hsd").load(fixture())
      .where(col("Time") >= 1.0 && col("Time") < 3.0)
      .select("Time", "A_x [g]")
      .orderBy("Time")

  /** q50: the reference's ACTUAL execution model under the oracle —
    * event-driven streaming ingest (`main.py:29-47`). A fresh landing
    * dir gets the fixture acquisition; the Structured Streaming
    * pipeline (binaryFile events → stateful completeness gate →
    * foreachBatch batch pipeline) runs with Trigger.AvailableNow to
    * drain the backlog and stop; the query returns the RMS table read
    * back from the partitioned sink. Same closed-form oracle as q20:
    * the streaming path must produce byte-identical RMS rows. */
  def q50(s: SparkSession, dir: String): DataFrame = {
    // landing fixture staged ONCE per JVM (input staging, untimed by
    // design — see StagedInputs); every invocation runs the full
    // stream lifecycle on a fresh checkpoint + output dir
    val landing = StagedInputs.dir("q50", dir) { d =>
      AcquisitionFixture.write(s"$d/LAF1_fixture", AcquisitionFixture.Spec())
    }
    val base = java.nio.file.Files.createTempDirectory("graft_q50").toString
    graft.streaming.StreamingIngest.run(
      s, landing, s"$base/out", s"$base/ckpt")
    // materialize the (3-row) result off the temp files, then delete
    // the run's tree — Bench's median-of-3 re-invokes this query, and
    // leaked sink+checkpoint trees accumulate disk per run
    val out = s.read.parquet(s"$base/out/data_parquet_rms")
      .select(col("rms_x"), col("rms_y"), col("rms_z"), col("rms_mod"),
        col("Time"), col("alias").cast("string").as("alias"))
      .localCheckpoint(eager = true)
    deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("Time")
  }

  private[graft] def deleteTree(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_hsd2_decode" -> (q10 _),
    "q20_rms_pipeline" -> (q20 _),
    "q35_hsd_source" -> (q35 _),
    "q50_streaming_rms" -> (q50 _),
  )

  val q10Sql: String = fixtureSamplesSql +
    """
       SELECT time_ns AS "Time", vx AS "A_x_g", vy AS "A_y_g",
              vz AS "A_z_g", 'LAF1' AS alias
       FROM vals ORDER BY "Time""""

  // mirrors Rms.compute: decimal(30,8) sum of v*v, completeness span
  // (0.999e9).toLong = 999000000 over long ns, left-assoc rms_mod
  val q20Sql: String = fixtureSamplesSql +
    """,
       w AS (
         SELECT time_ns//1000000000 AS bucket, count(*) AS n,
           min(time_ns) AS tmin, max(time_ns) AS tmax,
           CAST(sum(CAST(vx*vx AS DECIMAL(30,8))) AS DOUBLE) AS sx,
           CAST(sum(CAST(vy*vy AS DECIMAL(30,8))) AS DOUBLE) AS sy,
           CAST(sum(CAST(vz*vz AS DECIMAL(30,8))) AS DOUBLE) AS sz
         FROM vals GROUP BY 1),
       rms AS (
         SELECT sqrt(sx / CAST(n AS DOUBLE)) AS rms_x,
                sqrt(sy / CAST(n AS DOUBLE)) AS rms_y,
                sqrt(sz / CAST(n AS DOUBLE)) AS rms_z,
                bucket * 1000000000 AS "Time"
         FROM w WHERE tmax - tmin >= 999000000)
       SELECT rms_x, rms_y, rms_z,
         sqrt(rms_x*rms_x + rms_y*rms_y + rms_z*rms_z) AS rms_mod,
         "Time", 'LAF1' AS alias
       FROM rms ORDER BY "Time""""

  val q35Sql: String = fixtureSamplesSql +
    """
       SELECT t AS "Time", vx AS "A_x [g]"
       FROM vals WHERE t >= 1.0 AND t < 3.0 ORDER BY "Time""""

  val oracles: Map[String, String] = Map(
    "q10_hsd2_decode" -> q10Sql,
    "q20_rms_pipeline" -> q20Sql,
    "q35_hsd_source" -> q35Sql,
    "q50_streaming_rms" -> q20Sql,
  )
}
