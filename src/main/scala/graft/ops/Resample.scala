package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — the time-series alignment
  * step (pandas `resample().ffill()`, TimescaleDB `time_bucket_gapfill`)
  * that a training pipeline needs whenever irregular event streams feed a
  * fixed-cadence model.
  *
  * Composition, not a new operator: the per-key grid is a narrow
  * `sequence → explode` off a tiny (|keys| rows) bounds aggregate, and the
  * fill is EXACTLY the as-of join semantics ([[AsOfJoin.asofJoin]]: latest
  * point ≤ slot), so the whole thing costs one bounds aggregate plus the
  * as-of's single keyed shuffle — no per-slot probe, no range explosion.
  * At 100 TB the grid side is |keys|·|slots| generated rows (never read
  * from disk) and the union-scan streams both sides once.
  */
object Resample {

  /** One row per (key, grid slot) for slots `floor(min t / step)` …
    * `floor(max t / step)` per key (slot time = slot·step, so the first
    * slot is at or before the key's first point), each carrying the
    * latest point at-or-before the slot (NULL when the slot precedes the
    * key's first point). `timeCol` must be integral (µs and alike);
    * `points` must be unique per (key, timeCol) — pre-aggregate, same
    * precondition as the as-of join.
    */
  def gridFfill(points: DataFrame, key: Seq[String], timeCol: String,
                step: Long, carry: Seq[(String, Column)]): DataFrame = {
    require(step > 0, "gridFfill: step must be positive")
    val bounds = points.groupBy(key.map(col): _*)
      .agg(min(col(timeCol)).as("__tmin"), max(col(timeCol)).as("__tmax"))
    // integer slot arithmetic: `DIV` floors on the corpus's non-negative
    // epochs, and slot*step stays in the time column's own units
    val grid = bounds
      .select(key.map(col) :+
        explode(sequence(expr(s"__tmin DIV $step"), expr(s"__tmax DIV $step")))
          .as("__slot"): _*)
      .select(key.map(col) :+ (col("__slot") * step).as("t_grid"): _*)
    // the fill rides the NATIVE as-of exec (each side shuffles at its own
    // width, one merge pass — no union widening of the generated grid);
    // carry expressions are first materialized as named point columns
    // since the physical operator projects by attribute
    val named = carry.zipWithIndex.map { case ((n, c), i) => (n, s"__carry_$i", c) }
    val pts = named.foldLeft(points) { case (df, (_, tmp, c)) =>
      df.withColumn(tmp, c)
    }
    graft.plans.NativeAsOf.asofJoin(grid, pts, key, "t_grid", timeCol,
      named.map { case (n, tmp, _) => n -> tmp })
  }
}
