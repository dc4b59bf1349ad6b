package graft

import org.apache.spark.sql.functions._

class OrcSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trip preserves rows; partition pruning reaches the scan") {
    val base = tmpDir("orc_spec")
    val df = (0 until 200).map { i =>
      (i.toLong, s"p${i % 4}", s"text-$i", (i * 13 % 97).toLong)
    }.toDF("id", "part", "body", "score")
    df.repartition(3)
      .write.partitionBy("part")
      .option("compression", "zlib")
      .option("orc.bloom.filter.columns", "id")
      .orc(s"$base/t")
    val back = spark.read.orc(s"$base/t")
    // content identical (partition column round-trips as string)
    val got = back.select("id", "part", "body", "score")
      .orderBy("id").collect().toSeq
    val want = df.select("id", "part", "body", "score")
      .orderBy("id").collect().toSeq
    assert(got == want)
    // a partition-key filter must prune at the SCAN (inputFiles
    // reflects the unpruned logical index, so inspect the physical
    // scan's PartitionFilters instead)
    val pruned = back.where(col("part") === "p2")
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("p2"),
      s"no partition filter at the scan:\n${scan.take(600)}")
    assert(pruned.count() == 50)
  }
}
