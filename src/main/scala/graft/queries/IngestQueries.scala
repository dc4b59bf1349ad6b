package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.AcquisitionFixture
import graft.ingest.{Ingest, Pipeline}

/** Ingest-side queries (SURVEY.md §2.C Q10): HSD2 binary decode and
  * the full acquisition pipeline, driven off a deterministic synthetic
  * fixture (FIXTURES.md §1). Not SQL-expressible over the testdata
  * tables, so the driver records rows-only checks; value correctness
  * is asserted by Hsd2Spec/PipelineSpec closed-form tests.
  */
object IngestQueries {

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_hsd2_decode" -> (q10 _),
    "q20_rms_pipeline" -> (q20 _),
    "q35_hsd_source" -> (q35 _),
  )
}
