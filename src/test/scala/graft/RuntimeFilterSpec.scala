package graft

import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilter

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val fact = (0L until 2000L).map(i => (i % 500, i)).toDF("k", "payload")
    // dim keys 0..49 → 10% of fact's key space joins
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "tag")
    (fact, dim)
  }

  test("bloomPrunedJoin result == plain join (default sizing)") {
    val (fact, dim) = fixture
    val got = RuntimeFilter.bloomPrunedJoin(fact, dim, Seq("k"))
      .orderBy("k", "payload").collect().toSeq
    val want = fact.join(dim, Seq("k"))
      .orderBy("k", "payload").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("exact even when the sketch is tiny (high FP rate)") {
    val (fact, dim) = fixture
    // 64 bits for 50 keys — FP rate near 1; join must still be exact
    val got = RuntimeFilter.bloomPrunedJoin(fact, dim, Seq("k"),
        expectedItems = 50L, numBits = 64L)
      .orderBy("k", "payload").collect().toSeq
    val want = fact.join(dim, Seq("k"))
      .orderBy("k", "payload").collect().toSeq
    assert(got == want)
  }

  test("no false negatives: every dim key passes might_contain") {
    val (_, dim) = fixture
    val sketch = RuntimeFilter.bloomSketch(dim, Seq("k"),
      expectedItems = 50L, numBits = 4096L)
    val surviving = dim.where(RuntimeFilter.mightContain(sketch, Seq("k")))
      .count()
    assert(surviving == dim.count())
  }

  test("pruning is effective on a selective dim") {
    val (fact, dim) = fixture
    val sketch = RuntimeFilter.bloomSketch(dim, Seq("k"),
      expectedItems = 50L, numBits = 65536L)
    val kept = fact.where(RuntimeFilter.mightContain(sketch, Seq("k")))
      .count()
    val joining = fact.where(col("k") < 50).count()
    // well-sized sketch: survivors ≈ joining rows, far below the total
    assert(kept >= joining, "a joining row was pruned (false negative)")
    assert(kept < fact.count() / 2,
      s"sketch pruned nothing: kept=$kept of ${fact.count()}")
  }

  test("might_contain predicate sits in the plan before the join") {
    // a local-relation fact would let ConvertToLocalRelation evaluate
    // the predicate at optimization time (filter vanishes from the
    // plan); range() keeps a real scan so the Filter must show
    val fact = spark.range(0, 2000).select(
      (col("id") % 500).as("k"), col("id").as("payload"))
    val (_, dim) = fixture
    val plan = RuntimeFilter.bloomPrunedJoin(fact, dim, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain filter in the plan:\n$plan")
  }

  test("multi-column keys join exactly") {
    val fact = (0L until 1000L).map(i => (i % 20, i % 7, i))
      .toDF("a", "b", "payload")
    val dim = (0L until 10L).map(i => (i, i % 7, s"d$i")).toDF("a", "b", "tag")
    val got = RuntimeFilter.bloomPrunedJoin(fact, dim, Seq("a", "b"))
      .orderBy("a", "b", "payload").collect().toSeq
    val want = fact.join(dim, Seq("a", "b"))
      .orderBy("a", "b", "payload").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("empty dim side fails loudly") {
    val (fact, dim) = fixture
    val ex = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomPrunedJoin(fact, dim.where(lit(false)), Seq("k"))
    }
    assert(ex.getMessage.contains("empty dim side"))
  }
}
