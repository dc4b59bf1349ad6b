package graft

import graft.operators.Rolling

class RollingSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala doubled-median of a sorted window. */
  private def med2(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.length
    s((n + 1) / 2 - 1) + s(n / 2) // 1-indexed picks → 0-indexed
  }

  test("medianMad equals the sliding-window reference for both parities") {
    val vals = Seq[Long](10, 20, 5, 80, 15, 12, 300, 7, 9, 11)
    val df = vals.zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }
      .toDF("g", "t", "x")
    val got = Rolling.medianMad(df, "g", Seq("t"), "x", window = 4, k = 3)
      .orderBy("t")
      .collect()
      .map(r => (r.getAs[Long]("med2"), r.getAs[Long]("mad4"),
        r.getAs[Long]("outlier")))
    val want = vals.indices.map { i =>
      val w = vals.slice(math.max(0, i - 3), i + 1)
      val m2 = med2(w)
      val m4 = med2(w.map(x => (2 * x - m2).abs))
      val fl = if (2 * (2 * vals(i) - m2).abs > 3 * m4) 1L else 0L
      (m2, m4, fl)
    }
    assert(got.toSeq == want,
      s"got ${got.toSeq}\nwant $want")
    // the 300 spike must flag; its neighbors must not
    assert(got(6)._3 == 1L && got(5)._3 == 0L && got(7)._3 == 0L)
  }

  test("medianMad: per-group isolation and partition invariance") {
    val rows = (0 until 500).map { i =>
      ((i % 7).toLong, i.toLong, ((i * 37 + 11) % 100).toLong)
    }
    val df = rows.toDF("g", "t", "x")
    val a = Rolling.medianMad(df, "g", Seq("t"), "x", window = 7)
      .orderBy("g", "t").collect().toSeq
    val b = Rolling.medianMad(df.toDF("g", "t", "x").repartition(17),
        "g", Seq("t"), "x", window = 7)
      .orderBy("g", "t").collect().toSeq
    assert(a == b && a.size == 500)
    // a window never crosses groups: first row of every group has
    // n=1 → med2 = 2x, mad4 = 0
    val firsts = a.filter(_.getAs[Long]("t") < 7)
    assert(firsts.size == 7)
    firsts.foreach { r =>
      assert(r.getAs[Long]("med2") == 2 * r.getAs[Long]("x") &&
        r.getAs[Long]("mad4") == 0L)
    }
  }
}
