package graft

import graft.model.TagToggle
import graft.operators.Tagging

class TaggingSpec extends SparkSpec {
  import spark.implicits._

  private val toggles = Seq(
    TagToggle("walk", enable = true, ts = 100L),
    TagToggle("walk", enable = false, ts = 300L),
    TagToggle("walk", enable = true, ts = 500L), // still open at end
    TagToggle("run violent", enable = true, ts = 250L),
    TagToggle("run violent", enable = false, ts = 260L))

  test("labelSamples: per-label boolean columns from toggle history") {
    val samples = Seq(50L, 100L, 200L, 299L, 300L, 400L, 255L, 600L)
      .toDF("Time")
    val out = Tagging.labelSamples(samples, toggles)
      .orderBy("Time").collect()
      .map(r => (r.getAs[Long]("Time"),
        r.getAs[Boolean]("tag_run_violent"), r.getAs[Boolean]("tag_walk")))
    val expect = Seq(
      (50L, false, false),   // before every toggle
      (100L, false, true),   // toggle instant is inclusive
      (200L, false, true),
      (255L, true, true),    // inside the 10ns run burst
      (299L, false, true),
      (300L, false, false),  // disable instant turns the tag off
      (400L, false, false),
      (600L, false, true))   // re-enabled, still open
    assert(out.toSeq == expect)
    // shuffle-free: the labeling is pure projection over literals
    val plan = Tagging.labelSamples(samples, toggles)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan:\n$plan")
  }

  test("labels colliding after sanitization are refused, not silently merged") {
    val samples = Seq(1L).toDF("Time")
    val e = intercept[IllegalArgumentException] {
      Tagging.labelSamples(samples, Seq(
        TagToggle("walk run", enable = true, 1L),
        TagToggle("walk,run", enable = true, 2L)))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("intervals: open/close pairing with a trailing open interval") {
    val iv = Tagging.intervals(toggles)
    assert(iv == Seq(
      ("run violent", 250L, 260L),
      ("walk", 100L, 300L),
      ("walk", 500L, Long.MaxValue)))
  }

  test("acquisition_info tags array parses to toggles") {
    val info = graft.model.AcquisitionInfo.fromJson(
      """{"uuid":"u","name":"n","start_time":"2025-07-11T16:22:17.000Z",
         "tags":[{"l":"walk","e":true,"ta":"2025-07-11T16:22:18.000Z"},
                 {"l":"walk","e":false,"ta":"2025-07-11T16:22:19.500Z"},
                 {"l":"bad","e":true}]}""")
    assert(info.tags == Seq(
      TagToggle("walk", enable = true, ts = 1752250938000000000L),
      TagToggle("walk", enable = false, ts = 1752250939500000000L)))
  }
}
