package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch phase profiler for q106 — not part of the product surface. */
object ProfileQ106 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    graft.SparkEntry.queries("q09_join_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      println(s"--- run $i")
      val li = graft.queries.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      def edges = li.groupBy("l_orderkey")
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(col("ps")).as("src"), col("ps"))
        .select(col("src"), explode(col("ps")).as("dst"))
        .where(col("src") < col("dst"))
      time("current full")(
        graft.operators.Graph.triangleCounts(edges, "src", "dst").orderBy("node")
          .write.format("noop").mode("overwrite").save())
      graft.Sessions.release(spark)
      // fused design: ONE node-keyed shuffle builds dedup'd sorted
      // adjacency; deg = size(nbrs); canonical distinct edges derive
      // by exploding the adjacency (narrow, from cache)
      time("fused full") {
        val canon0 = edges.select(
          least(col("src"), col("dst")).cast(LongType).as("a"),
          greatest(col("src"), col("dst")).cast(LongType).as("b"))
          .where(col("a") =!= col("b"))
        val adj = canon0.select(col("a").as("node"), col("b").as("nbr"))
          .union(canon0.select(col("b").as("node"), col("a").as("nbr")))
          .groupBy("node")
          .agg(sort_array(collect_set(col("nbr"))).as("nbrs"))
          .cache()
        val statsRow = adj.agg(max(size(col("nbrs"))), count(lit(1)),
          sum(size(col("nbrs")))).head()
        val maxDeg = statsRow.getInt(0)
        val nNodes = statsRow.getLong(1)
        println(s"  maxDeg=$maxDeg nNodes=$nNodes")
        val canon = adj.select(col("node").as("a"), explode(col("nbrs")).as("b"))
          .where(col("a") < col("b"))
        val withCounts = canon
          .join(broadcast(adj.select(col("node").as("a"), col("nbrs").as("na"))), Seq("a"))
          .join(broadcast(adj.select(col("node").as("b"), col("nbrs").as("nb"))), Seq("b"))
          .select(col("a"), col("b"),
            graft.functions.SortedIntersectCountLong(col("na"), col("nb"))
              .cast(LongType).as("c"))
          .where(col("c") > 0)
        val perNode = withCounts.select(explode(array(
            struct(col("a").as("node"), col("c")),
            struct(col("b").as("node"), col("c")))).as("s"))
          .select(col("s.node").as("node"), col("s.c").as("c"))
          .groupBy("node").agg(expr("sum(c) div 2").as("tri"))
        adj.select(col("node"), size(col("nbrs")).cast(LongType).as("deg"))
          .join(broadcast(perNode), Seq("node"), "left")
          .select(col("node"), col("deg"),
            coalesce(col("tri"), lit(0L)).as("triangles"))
          .orderBy("node")
          .write.format("noop").mode("overwrite").save()
      }
      graft.Sessions.release(spark)
    }
    spark.stop()
  }
}
