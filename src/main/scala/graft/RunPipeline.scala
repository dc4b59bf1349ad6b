package graft

/** CLI entry point for the acquisition pipeline — batch or streaming.
  *
  * {{{
  *   runMain graft.RunPipeline <landingDir> <outDir>            # batch
  *   runMain graft.RunPipeline <landingDir> <outDir> --stream   # AvailableNow stream
  * }}}
  *
  * Batch processes every currently-complete acquisition under the
  * landing prefix; --stream runs the Structured Streaming gate with
  * checkpointing (incremental across invocations: an acquisition
  * fires exactly once, when its required file set completes).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <landingDir> <outDir> [--stream]")
    val Array(landing, out) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus.toInt)
    try {
      if (args.contains("--stream")) {
        streaming.StreamingIngest.run(spark, landing, out, s"$out/_checkpoint")
        println(s"""{"mode":"stream","landing":"$landing","out":"$out"}""")
      } else {
        val n = ingest.Pipeline.processLanding(spark, landing, out)
        println(s"""{"mode":"batch","acquisitions":$n,"out":"$out"}""")
      }
    } finally spark.stop()
  }
}
