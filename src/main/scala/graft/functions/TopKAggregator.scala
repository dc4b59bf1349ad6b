package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (`Aggregator[IN,BUF,OUT]`, SURVEY.md §2.B):
  * keeps the k best (score, id) pairs per group with map-side
  * partial aggregation — each task reduces its partition to ≤ k rows
  * per group BEFORE the exchange, so a top-k over an N×M candidate
  * join shuffles O(groups·k·tasks) rows instead of all N·M.
  * Ordering: score descending, id ascending on ties (deterministic).
  */
object TopKAggregator {

  type Scored = (Long, Double) // (id, score)

  final case class TopK(k: Int)
      extends Aggregator[Scored, List[Scored], Seq[Scored]] {

    override def zero: List[Scored] = Nil

    private def insert(buf: List[Scored], x: Scored): List[Scored] = {
      // descending score, ascending id; list length capped at k
      val (better, worse) = buf.span(e =>
        e._2 > x._2 || (e._2 == x._2 && e._1 < x._1))
      val merged = better ::: (x :: worse)
      if (merged.length > k) merged.init else merged
    }

    override def reduce(buf: List[Scored], x: Scored): List[Scored] =
      insert(buf, x)

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)

    override def finish(buf: List[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
