package graft

/** Regenerates the checked-in BPE merge table
  * (`src/main/resources/graft/bpe_merges.txt`) from the testdata
  * documents — run once, commit the result; the encoder and the q57
  * oracle both replay the committed table, so retraining is an
  * explicit, reviewed step, not an implicit runtime dependency.
  *
  * Usage: `runMain graft.BpeTrain [sfDir] [outFile] [numMerges]`
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/bpe_merges.txt"
    val numMerges = if (args.length > 2) args(2).toInt else 80
    val spark = Sessions.local(8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.functions.Bpe.train(docs, "text", numMerges)
    val p = java.nio.file.Paths.get(out)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      merges.map { case (l, r) => s"$l\t$r" }.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    println(s"[bpe-train] wrote ${merges.size} merges to $out")
    spark.stop()
  }
}
