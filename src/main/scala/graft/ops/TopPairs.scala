package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sort-based "count runs, subtract marked runs, keep local top-k" — the
  * one-exchange tail for top-k-by-multiplicity queries whose group count is
  * nearly the row count (gt5's common-neighbor pairs: ~1.3 rows/group, so a
  * hash aggregate's partial stage reduces nothing and its final stage
  * builds a hash table the size of the data).
  *
  * Input is a single BIGINT column `k` = key·2 + tag: tag 1 rows are
  * instances to count, tag 0 rows mark keys to EXCLUDE (they sort first
  * within a run, so exclusion is decided before any counting work). The
  * pass is the mapPartitions last-resort tier (SURVEY §2 preference (d)),
  * taken deliberately: built-in operators can't express "run-length count
  * + marker subtraction + bounded local top-k" in one pass, and the win is
  * structural — ONE keyed exchange of 8-byte rows replaces a no-op partial
  * aggregate, a data-scale final hash aggregate, a second exchange for the
  * anti-join, and a full-width TakeOrdered. Per-task state is O(k).
  *
  * Ties break toward the SMALLEST key (count desc, key asc) — the caller's
  * packed key must make that the order it wants.
  */
object TopPairs {

  /** Per-partition exact top-k of (key, multiplicity) over non-excluded
    * runs. Emits ≤ k rows per partition, unordered — the caller applies
    * the global TakeOrdered over the ≤ k·partitions survivors.
    */
  def runLengthTopK(spark: SparkSession, tagged: DataFrame,
                    k: Int): Dataset[(Long, Long)] = {
    import spark.implicits._
    tagged
      .repartition(expr("k div 2"))
      .sortWithinPartitions("k")
      .as[Long]
      .mapPartitions { it =>
        val topC = new Array[Long](k)
        val topK = new Array[Long](k)
        var sz = 0
        var cur = Long.MinValue
        var cnt = 0L
        var excluded = false
        var worst = -1 // cached index of the weakest kept entry
        // (c, key) beats slot i on (count desc, key asc)
        def beats(c: Long, key: Long, i: Int): Boolean =
          c > topC(i) || (c == topC(i) && key < topK(i))
        def rescanWorst(): Unit = {
          worst = 0
          var i = 1
          while (i < k) { if (beats(topC(worst), topK(worst), i)) worst = i; i += 1 }
        }
        def offer(key: Long, c: Long): Unit = {
          if (sz < k) {
            topC(sz) = c; topK(sz) = key; sz += 1
            if (sz == k) rescanWorst()
          } else if (beats(c, key, worst)) { // O(1) reject for the common case
            topC(worst) = c; topK(worst) = key
            rescanWorst()
          }
        }
        def flush(): Unit =
          if (cur != Long.MinValue && !excluded && cnt > 0) offer(cur, cnt)
        while (it.hasNext) {
          val raw = it.next()
          val key = raw >>> 1
          if (key != cur) { flush(); cur = key; cnt = 0; excluded = false }
          if ((raw & 1L) == 0L) excluded = true else cnt += 1
        }
        flush()
        (0 until sz).iterator.map(i => (topK(i), topC(i)))
      }
  }
}
