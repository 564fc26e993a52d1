package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-pruning for "does this row's key appear in that other
  * table" joins whose probe side is enormous and whose build side is small
  * — the benchmark-decontamination case: the corpus side is the 100 TB
  * scan, the benchmark n-gram set is millions of rows.
  *
  * Generate-then-verify, like every approximate tier in this repo: the
  * Bloom sketch prunes (false positives possible, false negatives not), an
  * EXACT join verifies the survivors, so the final result is exact no
  * matter how the sketch is sized. What the sketch buys at scale: the
  * exact join's shuffle carries only bloom-positive rows (≈ true matches +
  * fpp·|probe|) instead of every n-gram of the corpus — with fpp=1% the
  * decontamination shuffle shrinks ~100× while the scan stays narrow.
  *
  * The sketch itself is built with `DataFrameStatFunctions.bloomFilter`
  * (a treeAggregate: executors build partial sketches, the driver holds
  * only the merged ~MB-scale bit array), then broadcast once. Spark keeps
  * its runtime-filter `might_contain` expression internal, so the probe is
  * a Scala UDF — off the codegen path, but it guards a shuffle, not a
  * scan-side hot loop, and the column it reads was already materialized by
  * the explode above it.
  */
object Bloom {

  /** A predicate Column `mightContain(keyExpr)` backed by a Bloom sketch of
    * `build`'s `keyCol` (string). `expectedItems`/`fpp` size the bit array
    * (bits ≈ -n·ln(fpp)/ln²2 — 1M items at 1% ≈ 1.2 MB).
    *
    * Building the sketch is an eager job (index-build discipline, same as
    * the IVF/PQ training steps): run once, reuse the returned predicate
    * across any number of probe plans.
    */
  def mightContain(build: DataFrame, keyCol: String,
                   expectedItems: Long, fpp: Double): Column => Column = {
    val sketch = build.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = build.sparkSession.sparkContext.broadcast(sketch)
    val probe = udf((k: String) => k != null && bc.value.mightContainString(k))
    (key: Column) => probe(key)
  }

  /** Long-keyed variant — for composite keys packed into one long (e.g. a
    * graph edge (u,v) as an arithmetic combination). Any deterministic
    * packing is safe even if it collides: build and probe share the
    * encoding, so a packing collision can only ADD a false positive for
    * the exact verify to discard — never a false negative.
    */
  def mightContainLong(build: DataFrame, keyCol: String,
                       expectedItems: Long, fpp: Double): Column => Column = {
    val sketch = build.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = build.sparkSession.sparkContext.broadcast(sketch)
    val probe = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    (key: Column) => probe(key)
  }
}
