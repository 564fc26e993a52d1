package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed [[Aggregator]] — the
  * "frequent items at 100 TB" op. A plain `groupBy(token).count()`
  * shuffles the FULL key domain; this aggregate carries a bounded
  * `capacity`-entry summary through partial aggregation, so the exchange
  * moves O(partitions · capacity) rows no matter the domain size.
  *
  * Guarantee (classic MG, preserved under ANY merge order/partitioning):
  * every item with true count > N/(capacity+1) is present in the final
  * summary, and each reported count understates the truth by at most
  * N/(capacity+1). Summaries are therefore CANDIDATE sets, not answers —
  * the caller re-verifies candidates exactly (generate-then-verify, the
  * same discipline as the LSH/ANN ops), which is what makes the final
  * heavy-hitter set deterministic and oracle-checkable
  * (`hh1_heavy_hitters`) even though intermediate summaries depend on
  * merge order.
  *
  * Input is the per-row token ARRAY (no explode of the corpus: the fold
  * happens inside the partial aggregate).
  */
object MisraGries {

  /** One MG insertion — the shared core: the batch [[Summary]] aggregator
    * and the streaming state fold ([[graft.streaming.StreamOps]]
    * frequentTypes) both step through here, so the summary semantics (and
    * the N/(capacity+1) guarantee) can never drift between tiers.
    */
  def add1(m: Map[String, Long], t: String, capacity: Int): Map[String, Long] =
    m.get(t) match {
      case Some(c)              => m.updated(t, c + 1)
      case None if m.size < capacity => m.updated(t, 1L)
      // full and new key: decrement every counter (the "pair off one
      // occurrence of each" step), dropping zeros — the new key is
      // consumed by the same pairing
      case None => m.collect { case (k, v) if v > 1 => k -> (v - 1) }
    }

  class Summary(capacity: Int)
      extends Aggregator[Seq[String], Map[String, Long], Map[String, Long]] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    def zero: Map[String, Long] = Map.empty

    def reduce(buf: Map[String, Long], tokens: Seq[String]): Map[String, Long] =
      tokens.foldLeft(buf)(MisraGries.add1(_, _, capacity))

    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val c = (b1.keySet ++ b2.keySet).iterator
        .map(k => k -> (b1.getOrElse(k, 0L) + b2.getOrElse(k, 0L))).toMap
      if (c.size <= capacity) c
      else {
        // subtract the (capacity+1)-th largest counter from all, drop ≤0
        // (Agarwal et al.'s mergeable-summaries step: error stays additive)
        val cut = c.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
        c.collect { case (k, v) if v > cut => k -> (v - cut) }
      }
    }

    def finish(buf: Map[String, Long]): Map[String, Long] = buf

    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
