package graft

import graft.operators.BioLake

/** FASTA/FASTQ walk: assembly and length laws, alphabet/quality
  * domains, strictness matrix, fixture-law equality, flip sweep. */
class BioLakeSpec extends SparkSpec {

  private def parse(s: String) = BioLake.parseBio(s.getBytes("UTF-8"))

  test("hand-written records parse with the right census") {
    val fa = parse(">r1 first\nACGT\nNNGC\n>r2\nAAAA\n").get
    assert(fa._1 == "fasta" && fa._2.size == 2)
    val r1 = fa._2.head
    assert((r1.name, r1.length, r1.gc, r1.nCount) == ("r1", 8, 4, 2))
    assert(r1.qualSum.isEmpty)
    val fq = parse("@x\nACGT\n+\n!!IJ\n@y\nGG\n+y\n~~\n").get
    assert(fq._1 == "fastq" && fq._2.size == 2)
    assert(fq._2.head.qualSum.contains(0L + 0 + 40 + 41))
    assert(fq._2(1).qualSum.contains(2L * 93))
  }

  test("strictness matrix: every violation rejects") {
    val rejects = Seq(
      "lowercase base" -> ">r\nacgt\n",
      "foreign base" -> ">r\nACGU\n",
      "empty sequence" -> ">r1\n>r2\nAC\n",
      "blank line inside" -> ">r\nAC\n\nGT\n",
      "missing final newline" -> ">r\nACGT",
      "empty header name" -> ">\nACGT\n",
      "fastq quality shorter" -> "@x\nACGT\n+\n!!!\n",
      "fastq quality longer" -> "@x\nACGT\n+\n!!!!!\n",
      "fastq wrong separator name" -> "@x\nACGT\n+y\n!!!!\n",
      "fastq quality below domain" -> ("@x\nACGT\n+\n!! !\n"),
      "fastq truncated record" -> "@x\nACGT\n+\n",
      "fastq name with space" -> "@x y\nAC\n+\n!!\n",
      "neither format" -> "ACGT\n",
      "CR line endings" -> ">r\r\nACGT\r\n",
      "empty file" -> "")
    rejects.foreach { case (name, s) => assert(parse(s).isEmpty, name) }
    assert(BioLake.parseBio(null).isEmpty)
    assert(BioLake.parseBio(Array(0xc3.toByte, 0x28.toByte)).isEmpty)
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = BioLake.extractBio(
      BioLake.bioFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(8)))
    assert(out.length == (0 until 12).map(i => 2 + i % 3).sum)
    out.foreach { r =>
      val (i, k) = (r.getLong(0), r.getInt(1))
      val len = 20 + (i + k * 7) % 30
      assert(r.getString(2) == (if (i % 2 == 0) "fasta" else "fastq"))
      assert(r.getString(3) == s"seq_${i}_$k")
      assert(r.getInt(4) == len)
      val codes = (0L until len).map(j => (i * 3 + k * 5 + j) % 5)
      assert(r.getInt(5) == codes.count(c => c == 1 || c == 2))
      assert(r.getInt(6) == codes.count(_ == 4))
      if (i % 2 == 1)
        assert(r.getLong(7) == (0L until len).map(j => (i + k + j) % 40).sum)
      else assert(r.isNullAt(7))
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = BioLake.bioFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      BioLake.parseBio(c) // must not throw
    }
  }
}
