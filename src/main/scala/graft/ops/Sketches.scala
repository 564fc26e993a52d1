package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the telemetry tier of a 100 TB
  * pipeline. Exact `countDistinct` shuffles every distinct value; the HLL++
  * sketch is a few KB per group, merges associatively (partial aggregation
  * stays map-side), and its error is a knob. Same trade for quantiles:
  * exact percentiles need a sort; the positional-index sketch behind
  * `percentile_approx` streams. Both are Spark-native codegen'd aggregates;
  * results are deterministic for a fixed input (sketches are
  * order-insensitive), but NOT comparable bit-for-bit across engines —
  * semantics are pinned by SketchesSpec against exact references instead
  * of the DuckDB gate.
  */
object Sketches {

  /** Per-group approximate distinct count. rsd = target relative error. */
  def approxDistinct(df: DataFrame, keys: Seq[String], c: Column,
                     rsd: Double = 0.02): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(c, rsd).as("approx_distinct"))

  /** Per-group approximate quantiles at the given probabilities.
    * accuracy = 1/eps: rank error ≤ n/accuracy.
    */
  def approxQuantiles(df: DataFrame, keys: Seq[String], c: Column,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(c,
        array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))
}
