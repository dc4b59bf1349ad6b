package graft

import org.apache.spark.sql.functions._

import graft.queries.Queries

/** Registry-query properties that the DuckDB oracle can't see:
  * the raw HLL estimate behind q34's boolean bound, and the salted
  * join's row-for-row equality with the plain join. */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q34: HLL rel_err within the 5% bound it publishes (rsd=0.02)") {
    val res = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val exact = r.getAs[Long]("exact_users")
      val approx = r.getAs[Long]("approx_users")
      val relErr = math.abs(approx - exact).toDouble / exact
      info(f"${r.getString(0)}: exact=$exact approx=$approx rel_err=$relErr%.4f")
      assert(relErr <= 0.05, s"rel_err $relErr breaches q34's approx_ok bound")
      assert(approx > 0)
    }
  }

  test("q40: salted join equals the plain join aggregate") {
    val plain = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect()
    val salted = Queries.q40(spark, sf)
      .select("c_mktsegment", "n").orderBy("c_mktsegment").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }
}
