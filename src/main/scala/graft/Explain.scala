package graft

/** Dev tool: print formatted physical plans for selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
