package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val R = 1000000000000L

  /** Plain-Scala integer PageRank — the oracle's formulation. */
  private def localPr(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => (s, xs.size.toLong) }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val base = (15L * (R / n)) / 100L
    var r = nodes.map(_ -> R / n).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (d, in) =>
        (d, in.map { case (s, _) => r(s) / deg(s) }.sum)
      }
      r = nodes.map(v => v -> (base + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
    }
    nodes.map(v => v -> (deg.getOrElse(v, 0L), r(v))).toMap
  }

  test("pageRankInt matches the local integer reference (cycle + dangler)") {
    // 1→2→3→1 cycle with a chord 1→3, feeder 4→1, dangling sink 5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (1L, 5L))
    val out = Graph.pageRankInt(edges.toDF("src", "dst"), "src", "dst", 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val want = localPr(edges, 4)
    val got = out.toMap
    assert(got == want, s"engine ${out.toSeq}\nlocal $want")
    // dangling sink: no out-edges → deg 0; it accumulates rank but
    // contributes none (its column exists, its row doesn't)
    assert(got(5L)._1 == 0L)
    // feeder with no in-edges settles at the teleport base
    assert(got(4L)._2 == (15L * (R / 5L)) / 100L)
  }

  test("deterministic and partition-invariant") {
    val edges = (0 until 300).map { i =>
      ((i % 40).toLong, ((i * 7 + 3) % 40).toLong)
    }.filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRankInt(df, "src", "dst", 5)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRankInt(df.repartition(11), "src", "dst", 5)
      .orderBy("node").collect().toSeq
    assert(a == b)
    assert(a == Graph.pageRankInt(df, "src", "dst", 5)
      .orderBy("node").collect().toSeq)
    assert(a.nonEmpty)
  }

  test("symmetric graph conserves mass up to bounded div loss") {
    val e0 = Seq((1L, 10L), (2L, 10L), (3L, 11L), (1L, 11L), (4L, 12L))
    val sym = e0 ++ e0.map(_.swap)
    val out = Graph.pageRankInt(sym.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(_.getLong(2))
    val total = out.sum
    // each rank loses < 1 unit per div, ≤ 3 divs deep per iteration:
    // the total must stay within nodes·iters·3 units of massScale
    assert(total <= R && total >= R - out.length * 3 * 3 - 100,
      s"total mass $total vs $R")
  }
}
