package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass grouped top-k as a typed [[Aggregator]] — the custom-aggregate
  * tier of the brief's preference order (built-ins → Expression →
  * Aggregator) applied where it beats the built-in shape:
  *
  * `Window.partitionBy(g).orderBy(score) + row_number <= k` must shuffle
  * AND SORT every row of every group. This aggregate keeps a bounded
  * k-element buffer per group through partial aggregation — map-side
  * combine reduces each partition's group to ≤k rows BEFORE the shuffle,
  * so the exchange carries O(groups·k) rows instead of all of them. At
  * 100 TB with k=3 that is the difference between shuffling 100 TB and
  * shuffling the answer.
  *
  * Semantics: smallest k by (score, tieBreak) — identical to
  * [[graft.ops.Grouped.groupTopK]] (oracle-checked by `a8_topk_agg`).
  */
object TopKAggregator {

  case class Entry(score: Double, tie: Long)

  class SmallestK(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    private def ord(e: Entry) = (e.score, e.tie)

    def zero: List[Entry] = Nil

    def reduce(buf: List[Entry], a: Entry): List[Entry] =
      ((a :: buf).sortBy(ord) : List[Entry]).take(k)

    def merge(b1: List[Entry], b2: List[Entry]): List[Entry] =
      ((b1 ++ b2).sortBy(ord) : List[Entry]).take(k)

    def finish(buf: List[Entry]): Seq[Entry] = buf

    def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }
}
