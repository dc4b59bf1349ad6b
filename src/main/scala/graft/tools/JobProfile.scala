package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Scratch per-job wall-clock profiler: runs one registry query with a
  * listener that prints every scheduled job's duration + call site.
  * Attribution tool for tiny-graph scheduling floors; not part of the
  * benchmark surface. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q121_personalized_pagerank")
    val spark = graft.Sessions.local(32)
    val starts = mutable.Map.empty[Int, (Long, String)]
    val lines = mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("callSite.short")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          lines += f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%8.3f s  $site"
        }
    })
    val fn = graft.SparkEntry.queries(name)
    // warm run (session costs), then timed run
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    graft.Sessions.release(spark)
    lines.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.foreach(println)
    println(f"TOTAL $dt%8.3f s  (${lines.size} jobs)")
    spark.stop()
  }
}
