package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins as binned EQUI-joins.
  *
  * Spark plans a join whose only predicate is an inequality as
  * BroadcastNestedLoopJoin (small side) or a cartesian product — both
  * quadratic in work and, at 100 TB, unusable unless one side is tiny.
  * The scale path is the classic bucketization rewrite: quantize the value
  * domain into fixed-width bins, replicate each interval into every bin it
  * touches, map each point/interval to its bin(s), equi-join on the bin id
  * (ordinary shuffled hash join), then apply the exact range predicate as
  * a post-filter. Work drops from |L|·|R| to Σ_bin |L_bin|·|R_bin|, and the
  * shuffle key (bin) spreads across the cluster; a hot bin is ordinary
  * shuffle skew (AQE skew-split applies). `binWidth` is the knob: wider
  * bins = less interval replication but bigger per-bin fan-in.
  *
  * Both joins emit each qualifying pair EXACTLY once without a distinct:
  * a point lives in exactly one bin (pointInInterval), and an overlapping
  * interval pair is attributed to the single bin containing the later of
  * the two starts (intervalOverlap) — that bin is covered by both sides'
  * replication ranges precisely when the pair overlaps.
  *
  * Columns are numeric (double); join timestamps by casting to epoch
  * seconds first (a cast, not a shuffle). Reference analog: catlas joins
  * adsorption-energy results against [target±range] windows
  * (predictions_utils.py energy-target filters) — at reference scale a
  * per-row filter, here a first-class join between two large sides.
  */
object RangeJoin {

  /** Inner-join `points` to every interval with lo <= p < hi (half-open). */
  def pointInInterval(points: DataFrame, pCol: Column,
                      intervals: DataFrame, loCol: Column, hiCol: Column,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    val p = points.withColumn("__bin", floor(pCol / w))
    // drop reversed intervals (hi < lo) up front: no point can qualify,
    // and sequence(start > stop) DESCENDS in Spark — it would silently
    // replicate the malformed row across every bin it doesn't touch
    val iv = intervals.filter(loCol <= hiCol).withColumn("__bin",
      explode(sequence(floor(loCol / w), floor(hiCol / w))))
    p.join(iv, Seq("__bin"))
      .filter(pCol >= loCol && pCol < hiCol)
      .drop("__bin")
  }

  /** Inner-join of two interval tables on closed-interval overlap:
    * lLo <= rHi AND rLo <= lHi. Column names must not collide.
    */
  def intervalOverlap(left: DataFrame, lLo: Column, lHi: Column,
                      right: DataFrame, rLo: Column, rHi: Column,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    // same reversed-interval guard as pointInInterval
    val l = left.filter(lLo <= lHi)
      .withColumn("__bin", explode(sequence(floor(lLo / w), floor(lHi / w))))
    val r = right.filter(rLo <= rHi)
      .withColumn("__bin", explode(sequence(floor(rLo / w), floor(rHi / w))))
    l.join(r, Seq("__bin"))
      .filter(lLo <= rHi && rLo <= lHi &&
        // exactly-once guard: emit only in the bin owning max(lLo, rLo)
        col("__bin") === floor(greatest(lLo, rLo) / w))
      .drop("__bin")
  }
}
