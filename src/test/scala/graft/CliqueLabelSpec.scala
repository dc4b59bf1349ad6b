package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** cliqueMinLabelPropagate: equality against minLabelPropagate over
  * the explicit pair expansion (the semantic contract), kernel vs
  * forced-distributed path equality, duplicate-row invariance, and
  * singleton-group exclusion. */
class CliqueLabelSpec extends SparkSpec {

  /** Seeded bipartite membership fixture: ~nG groups over nM members,
    * duplicated rows, group sizes 1..6 (singletons included). */
  private def fixture(seed: Int, nG: Int, nM: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until nG).flatMap { g =>
      val size = 1 + rnd.nextInt(6)
      val ms = Seq.fill(size)(rnd.nextInt(nM).toLong)
      // duplicate some rows on purpose (dup invariance is part of the
      // operator's contract — raw rows gate, kernel dedups)
      (ms ++ ms.take(size / 2)).map(m => (g.toLong + 1000, m))
    }
    rows.toDF("g", "m")
  }

  private def collectLabels(df: DataFrame): Seq[(Long, Long)] =
    df.orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def pairExpansion(memb: DataFrame): DataFrame =
    memb.distinct()
      .groupBy("g").agg(collect_set(col("m")).as("ss"))
      .select(explode(col("ss")).as("src"), col("ss"))
      .select(col("src"), explode(col("ss")).as("dst"))
      .where(col("src") =!= col("dst"))

  test("clique rounds equal minLabelPropagate over the explicit pair expansion") {
    for (seed <- Seq(7, 21); iters <- Seq(1, 3)) {
      val memb = fixture(seed, nG = 60, nM = 40)
      val viaClique = collectLabels(
        Graph.cliqueMinLabelPropagate(memb, "g", "m", iters))
      val viaPairs = collectLabels(
        Graph.minLabelPropagate(pairExpansion(memb), "src", "dst", iters))
      assert(viaClique == viaPairs, s"seed=$seed iters=$iters")
      assert(viaClique.nonEmpty)
    }
  }

  test("driver kernel is bit-equal to the forced-distributed supersteps") {
    val memb = fixture(11, nG = 50, nM = 30)
    val kernel = collectLabels(
      Graph.cliqueMinLabelPropagate(memb, "g", "m", iters = 3))
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
    try {
      val dist = collectLabels(
        Graph.cliqueMinLabelPropagate(memb, "g", "m", iters = 3))
      assert(kernel == dist)
    } finally {
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
    }
  }

  test("duplicate membership rows do not change the result") {
    val memb = fixture(5, nG = 40, nM = 25)
    val once = collectLabels(
      Graph.cliqueMinLabelPropagate(memb, "g", "m", iters = 2))
    val tripled = collectLabels(Graph.cliqueMinLabelPropagate(
      memb.union(memb).union(memb), "g", "m", iters = 2))
    assert(once == tripled)
  }

  test("members only of singleton groups are not nodes; clique min includes self") {
    import spark.implicits._
    // groups: {1,2}, {3} — member 3 is in no pair, members 1,2 link
    val memb = Seq((10L, 1L), (10L, 2L), (11L, 3L)).toDF("g", "m")
    val out = collectLabels(
      Graph.cliqueMinLabelPropagate(memb, "g", "m", iters = 1))
    assert(out == Seq((1L, 1L), (2L, 1L)))
    // forced-distributed agrees on the node set too
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
    try assert(collectLabels(
      Graph.cliqueMinLabelPropagate(memb, "g", "m", iters = 1)) == out)
    finally {
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
    }
  }
}
