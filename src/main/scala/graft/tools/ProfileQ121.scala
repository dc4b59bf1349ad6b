package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch phase profiler for q121 — not part of the product surface. */
object ProfileQ121 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    graft.SparkEntry.queries("q09_join_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      println(s"--- run $i")
      def t(n: String) = graft.queries.Tables.load(spark, dir, n)
      def e0 = t("orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t("lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
          Seq("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000000L)).as("dst"))
      def sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      // replicate personalizedPageRankInt body with timers
      val sources = Seq(0L, 7L, 42L)
      val eIn = sym.select(col("src").cast(LongType).as("src"),
        col("dst").cast(LongType).as("dst")).distinct()
      val e = time("ckpt e")(eIn.localCheckpoint(true))
      val nE = time("count e")(e.count())
      println(s"  nE=$nE")
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).cache()
      val eDeg = e.join(deg, Seq("src")).cache()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .union(spark.createDataFrame(
          spark.sparkContext.parallelize(
            sources.map(org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", LongType, false)))))
        .distinct().cache()
      val R = 1000000000000L
      val init = R / 3
      val base = (15L * init) / 100L
      val isSource = col("node").isin(sources: _*)
      var r = nodes.withColumn("r",
        when(isSource, lit(init)).otherwise(lit(0L)))
      time("build loop plan") {
        for (_ <- 1 to 3) {
          val sums = eDeg.join(broadcast(r.where(col("r") > 0)),
              col("src") === col("node"))
            .groupBy(col("dst").as("node"))
            .agg(sum(expr("r div deg")).as("s"))
          r = nodes.join(broadcast(sums), Seq("node"), "left")
            .select(col("node"),
              (when(isSource, lit(base)).otherwise(lit(0L)) +
                expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
            .localCheckpoint(eager = false)
        }
      }
      time("materialize") {
        r.join(broadcast(deg), col("node") === col("src"), "left")
          .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"), col("r"))
          .where(col("r") > 0).orderBy("node")
          .write.format("noop").mode("overwrite").save()
      }
      graft.Sessions.release(spark)
    }
    spark.stop()
  }
}
