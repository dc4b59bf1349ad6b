package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
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
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        lines += f"  stage ${si.stageId}%3d wall=$wall%7.3f s tasks=${si.numTasks}%4d " +
          f"run=${m.executorRunTime / 1e3}%7.3f cpu=${m.executorCpuTime / 1e9}%7.3f " +
          f"deser=${m.executorDeserializeTime / 1e3}%6.3f gc=${m.jvmGCTime / 1e3}%6.3f " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%8.2fMB  ${si.name.take(60)}"
      }
    })
    val names = if (args.isEmpty) Seq(name) else args.toSeq
    names.foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      // warm run (session costs), then timed run
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.Sessions.release(spark)
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(s"===== $nm =====")
      lines.foreach(println)
      val nJobs = lines.count(_.startsWith("job"))
      println(f"TOTAL $dt%8.3f s  ($nJobs jobs)")
      graft.Sessions.release(spark)
    }
    spark.stop()
  }
}
