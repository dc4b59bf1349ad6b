package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Salting}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join equals plain join on skewed data") {
    // 10k rows of one hot key + tail
    val big = spark.range(10000).select(
      when(col("id") < 9000, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
    val small = Seq((7L, "hot"), (3L, "cold"), (11L, "mild"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k")).orderBy("payload")
      .select("k", "payload", "label").collect()
    val salted = Salting.saltedEquiJoin(big, small, Seq("k")).orderBy("payload")
      .select("k", "payload", "label").collect()
    assert(plain.length > 9000, "hot key must dominate")
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("asof forward: earliest right row at or after left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L), (2L, 1L, 400L))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asofForward(left, right, "k", "k", "t", "rt", Seq("v"))
      .orderBy("name").collect()
      .map(r => (r.getAs[String]("name"), Option(r.get(r.fieldIndex("v")))))
    assert(out.toSeq == Seq(
      ("e1", Some(100L)), // t=10 matches rt=10 inclusively
      ("e2", Some(300L)), // t=25 → earliest at/after is 30
      ("e3", None)))      // t=5, only right row is at 1 → nothing after
  }

  test("asof backward matches reference semantics on ties and misses") {
    val left = Seq((1L, 10L, "a"), (1L, 9L, "b")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 1L), (1L, 5L, 2L)).toDF("k", "rt", "v")
    val out = AsOfJoin.asofBackward(left, right, "k", "k", "t", "rt", Seq("v"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[Long]("v"))).toMap
    assert(out("a") == 1L) // inclusive tie at t=10
    assert(out("b") == 2L) // most recent before 9 is 5
  }
}
