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

  /** Smallest-k distinct longs per group (gt5's neighborhood cap): the
    * buffer is an ascending list hard-capped at k, so per-group state is
    * O(k) on ANY hub degree and map-side combine ships ≤k values per
    * (group, partition) into the exchange — strictly bounded where both
    * the collect_list-then-slice spelling (O(degree) buffer) and the
    * row_number window (full per-partition sort of the edge list) are
    * not. Inputs are already distinct in gt5 (the oriented edge list is
    * deduped), so no distinctness bookkeeping is needed; values past a
    * full buffer's max are rejected in O(1).
    */
  class SmallestLongs(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    private def ins(buf: List[Long], v: Long): List[Long] = {
      var n = 0
      var last = Long.MinValue
      var it = buf
      while (it.nonEmpty) { n += 1; last = it.head; it = it.tail }
      if (n >= k && v >= last) buf
      else {
        val (lo, hi) = buf.span(_ < v)
        (lo ::: v :: hi).take(k)
      }
    }

    def zero: List[Long] = Nil
    def reduce(buf: List[Long], a: Long): List[Long] = ins(buf, a)
    def merge(b1: List[Long], b2: List[Long]): List[Long] =
      b2.foldLeft(b1)(ins)
    def finish(buf: List[Long]): Seq[Long] = buf

    def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
