package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (`Aggregator[IN,BUF,OUT]`, SURVEY.md §2.B):
  * keeps the k best (score, id) pairs per group with map-side
  * partial aggregation — each task reduces its partition to ≤ k rows
  * per group BEFORE the exchange, so a top-k over an N×M candidate
  * join shuffles O(groups·k·tasks) rows instead of all N·M.
  * Ordering: score descending, id ascending on ties (deterministic).
  *
  * The buffer is (size, worst-first sorted list): once a group's
  * buffer is full, the overwhelmingly common case — a candidate no
  * better than the current k-th — is rejected by ONE head comparison
  * and allocates nothing (a best-first list would pay an O(k) walk
  * plus O(k) fresh cons cells per reject, which at millions of ADC
  * candidates per task was the dominant cost of the ANN family). */
object TopKAggregator {

  type Scored = (Long, Double) // (id, score)

  final case class TopK(k: Int)
      extends Aggregator[Scored, (Int, List[Scored]), Seq[Scored]] {

    override def zero: (Int, List[Scored]) = (0, Nil)

    // strict "x outranks e": higher score, then smaller id
    private def better(x: Scored, e: Scored): Boolean =
      x._2 > e._2 || (x._2 == e._2 && x._1 < e._1)

    private def insert(buf: (Int, List[Scored]), x: Scored): (Int, List[Scored]) = {
      val (n, l) = buf
      if (n >= k && !better(x, l.head)) buf // worst kept beats x: O(1)
      else {
        val kept = if (n >= k) l.tail else l // full ⇒ evict the worst
        val (worse, rest) = kept.span(better(x, _))
        (math.min(n + 1, k), worse ::: (x :: rest))
      }
    }

    override def reduce(buf: (Int, List[Scored]), x: Scored): (Int, List[Scored]) =
      insert(buf, x)

    override def merge(
        a: (Int, List[Scored]), b: (Int, List[Scored])): (Int, List[Scored]) =
      b._2.foldLeft(a)(insert)

    override def finish(buf: (Int, List[Scored])): Seq[Scored] =
      buf._2.reverse // best first

    override def bufferEncoder: Encoder[(Int, List[Scored])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, List[Scored])]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
