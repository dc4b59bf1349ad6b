package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ShingleSet

/** Property guard for the ShingleSet kernel against a plain-Scala
  * reference: split on every single space (trailing empties kept),
  * sliding n-grams joined by single spaces, distinct, sorted in
  * UTF-8 BYTE order (the kernel's — and Spark StringType's — binary
  * ordering; Scala's String ordering is UTF-16 and disagrees above
  * U+E000, so the reference sorts byte arrays explicitly). */
object ShinglePropertySpec extends Properties("ShingleSet") {

  private val byteOrd: Ordering[Array[Byte]] = (a, b) => {
    val len = math.min(a.length, b.length)
    var i = 0
    var d = 0
    while (i < len && d == 0) {
      d = (a(i) & 0xff) - (b(i) & 0xff)
      i += 1
    }
    if (d != 0) d else a.length - b.length
  }

  private def ref(s: String, n: Int): Seq[String] = {
    val words = s.split(" ", -1).toSeq
    if (words.length < n) Seq.empty
    else words.sliding(n).map(_.mkString(" ")).toSeq.distinct
      .sortBy(_.getBytes("UTF-8"))(byteOrd)
  }

  // words over a small alphabet (forces duplicate shingles) plus
  // unicode — including supplementary chars to pin the byte ordering
  private val genWord = Gen.oneOf(
    Gen.stringOfN(1, Gen.oneOf('a', 'b')),
    Gen.oneOf("", "aa", "ab", "ü", "日本", "😀", "￮"))
  private val genText = for {
    k <- Gen.choose(0, 12)
    ws <- Gen.listOfN(k, genWord)
  } yield ws.mkString(" ")

  property("kernel == reference (content and order)") =
    Prop.forAll(genText, Gen.choose(1, 5)) { (s, n) =>
      val got = ShingleSet.compute(UTF8String.fromString(s), n)
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      gotSeq == ref(s, n)
    }

  property("output is sorted, distinct, and m-n+1 bounded") =
    Prop.forAll(genText, Gen.choose(1, 5)) { (s, n) =>
      val got = ShingleSet.compute(UTF8String.fromString(s), n)
      val seq = (0 until got.numElements()).map(got.getUTF8String)
      val sorted = seq.zip(seq.drop(1)).forall { case (a, b) =>
        a.compareTo(b) < 0
      }
      val words = s.split(" ", -1).length
      sorted && seq.size <= math.max(0, words - n + 1)
    }
}
