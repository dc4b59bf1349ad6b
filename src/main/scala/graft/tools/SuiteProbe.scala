package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Ask-#6 attribution probe (r19): WHY does a memory-bandwidth-bound
  * query (q66-family) inflate in FULL-SUITE runs when tiny-graph
  * controls hold? Runs the registry in Bench's lexical order
  * (repeats=1, noop sink, Sessions.release between — the same suite
  * state Bench accumulates), printing every query's wall; for the
  * TARGET query it prints per-stage task metrics. Immediately after
  * the suite, the target re-runs in the SAME session and then in a
  * FRESH session (same box window) so suite-state vs box-drift
  * separate cleanly. Scratch attribution tool, not a benchmark
  * surface. */
object SuiteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val target = args.headOption.getOrElse("q66_ivfpq_ann")
    var spark = graft.Sessions.local(32)
    val stageLines = mutable.ArrayBuffer.empty[String]
    @volatile var capture = false
    def listen(s: SparkSession): Unit =
      s.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
          if (capture) {
            val si = sc.stageInfo
            val m = si.taskMetrics
            val wall = (for { a <- si.submissionTime; c <- si.completionTime }
              yield (c - a) / 1e3).getOrElse(-1.0)
            stageLines += f"  stage ${si.stageId}%4d wall=$wall%7.3f tasks=${si.numTasks}%4d " +
              f"run=${m.executorRunTime / 1e3}%7.3f cpu=${m.executorCpuTime / 1e9}%7.3f " +
              f"deser=${m.executorDeserializeTime / 1e3}%6.3f gc=${m.jvmGCTime / 1e3}%6.3f " +
              f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB fetchWait=${m.shuffleReadMetrics.fetchWaitTime / 1e3}%6.3f " +
              f"${si.name.take(50)}"
          }
      })
    listen(spark)
    def runOnce(s: SparkSession, name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Sessions.release(s)
      dt
    }
    def probe(s: SparkSession, tag: String): Unit = {
      stageLines.clear(); capture = true
      val t = runOnce(s, target)
      capture = false
      Thread.sleep(300)
      println(s"### $target [$tag] wall=$t%s".format(""))
      println(f"### $target [$tag] wall=$t%.3f s")
      stageLines.foreach(println)
    }
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    // warm like Bench
    runOnce(spark, "q09_join_agg"); runOnce(spark, "q43_bucketed_join")
    val t0 = System.nanoTime()
    names.foreach { n =>
      if (n == target) probe(spark, "in-suite")
      else {
        val dt = runOnce(spark, n)
        if (dt > 1.0) println(f"[suite] $n $dt%7.3f s")
      }
    }
    println(f"[suite] total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // same session, right after the suite
    probe(spark, "post-suite same-session")
    probe(spark, "post-suite same-session 2nd")
    // fresh session, same box window
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    spark = graft.Sessions.local(32)
    listen(spark)
    runOnce(spark, target) // untimed cold run, like Bench --isolate
    probe(spark, "fresh-session")
    // box-health control
    val c1 = runOnce(spark, "q106_triangles")
    println(f"### q106 control (fresh session) $c1%.3f s")
    spark.stop()
  }
}
