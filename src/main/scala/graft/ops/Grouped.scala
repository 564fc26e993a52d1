package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped / windowed operators — SURVEY §2.5–2.6 (A3, A5–A9).
  *
  * The reference computes all of these per-partition and relies on an
  * implicit "one group never spans partitions" contract
  * (catlas/prediction_steps.py:242 + dask_utils.py:69-118). Spark windows
  * make the contract explicit: `Window.partitionBy(groupKeys)` hash-shuffles
  * once on the group key and every grouped op below rides that single
  * exchange — at 100 TB the window shuffle is the only wide dependency, and
  * AQE handles skewed groups.
  */
object Grouped {

  /** A7 `predictions_filter` (catlas/filters.py:266-350) — grouped EXISTS
    * with *soft-delete* semantics: if no row in the group satisfies `cond`,
    * every row of the group gets `filter_reason = reason`; rows of passing
    * groups keep their existing reason (first writer wins, filters.py:317-324).
    * The row count is unchanged — this is never a real filter.
    */
  def groupedExistsMark(df: DataFrame, groupCols: Seq[String], cond: Column,
                        reason: String, reasonCol: String = "filter_reason"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val ok = max(when(cond, 1).otherwise(0)).over(w)
    val existing = if (df.columns.contains(reasonCol)) col(reasonCol) else lit(null).cast("string")
    df.withColumn(reasonCol, when(ok === 0 && existing.isNull, lit(reason)).otherwise(existing))
  }

  /** A7 as a hard filter — the left-semi-join rewrite SURVEY §7.3 calls
    * for when the `filter_reason` column is unused: keep only groups where
    * a qualifying row exists. The semi-join beats the window form at
    * scale — no per-partition sort, and when the set of passing group keys
    * is small AQE broadcasts it, leaving the big side entirely unshuffled
    * (the window form always shuffles AND sorts the full table).
    */
  def groupedExistsKeep(df: DataFrame, groupCols: Seq[String], cond: Column): DataFrame = {
    val passing = df.filter(cond).select(groupCols.map(col): _*).distinct()
    df.join(passing, groupCols, "left_semi")
  }

  /** A8 surface-property top-k (catlas/filter_utils.py:568-620): per group,
    * keep the k best rows by `score` (ascending = lowest score wins, like
    * the reference's argpartition on surface energy). `tieBreak` must make
    * the order total or the result is nondeterministic.
    */
  def groupTopK(df: DataFrame, groupCols: Seq[String], score: Column,
                tieBreak: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(score +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** A8 variant: `top_proportion` — keep ceil(p · |group|) best rows
    * (filter_utils.py:607-614, top_k XOR top_proportion per the config
    * schema config_validation.py:194-203).
    */
  def groupTopProportion(df: DataFrame, groupCols: Seq[String], score: Column,
                         tieBreak: Seq[Column], p: Double): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(score +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
      .filter(col("__rn") <= ceil(col("__n") * lit(p))).drop("__rn", "__n")
  }

  /** A9 best-shift-per-facet (catlas/filter_utils.py:623-679): keep rows
    * with score within `thr` *relative* slack of the group minimum —
    * score ≤ min + thr·|min|. For positive scores this is the reference's
    * (1+thr)·min; the |min| form extends it safely to signed scores (with
    * the naive form, a negative minimum makes even the minimum row fail
    * its own threshold and silently empties the group). One window min,
    * no self-join; the min row always survives.
    */
  def withinThresholdOfMin(df: DataFrame, groupCols: Seq[String],
                           score: Column, thr: Double): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__min", min(score).over(w))
      .filter(score <= col("__min") + lit(thr) * abs(col("__min")))
      .drop("__min")
  }

  /** A3 per-row array min + argmin (catlas/adslab_predictions.py:323-354):
    * `array_min` plus 1-based `array_position` of the min — NaN/null-safe
    * (empty array → nulls, like the reference's NaN row).
    */
  def arrayMinArgmin(arr: Column): (Column, Column) =
    (array_min(arr), array_position(arr, array_min(arr)))

  /** A3 grouped form: argmin row per group via `min_by` (built-in typed
    * argmin — one partial+final aggregate, no window, no join). The struct
    * ordering key makes ties deterministic (bare min_by on a tied score
    * returns an arbitrary row).
    */
  def groupArgmin(df: DataFrame, groupCols: Seq[String], score: Column,
                  payload: Column, tieBreak: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(min(score).as("min_score"),
        min_by(payload, struct(score, tieBreak)).as("argmin"))

  /** A5 grouped OLS (catlas/parity_utils.py:206-243): per group N, MAE and
    * the regression of y on x — slope/intercept/R² in closed form from
    * decimal-exact sums (see [[Num]] for why: partial aggregation in any
    * order stays bit-identical, so this is one map-side-combined aggregate
    * even on 1000 executors).
    */
  def groupedRegression(df: DataFrame, groupCols: Seq[String],
                        x: Column, y: Column): DataFrame = {
    // six decimal sums per row are CPU-dense: project (x, y) once, floor
    // the input parallelism (no-op when the scan is already split — see
    // Dedup.parallelize), and aggregate the bound attributes
    val base = Dedup.parallelize(
      df.select(groupCols.map(col) ++ Seq(x.as("__x"), y.as("__y")): _*))
    val bx = col("__x"); val by = col("__y")
    val sx  = Num.dsum(bx);      val sy  = Num.dsum(by)
    val sxx = Num.dsum(bx * bx); val sxy = Num.dsum(bx * by)
    val syy = Num.dsum(by * by)
    // zero-variance groups (n=1, constant x or y) have no defined fit →
    // null (the reference's NaN row); also keeps ANSI mode from throwing
    // DIVIDE_BY_ZERO.
    val varx = col("sxx") - col("sx") * col("sx") / col("n")
    val vary = col("syy") - col("sy") * col("sy") / col("n")
    val cov = col("sxy") - col("sx") * col("sy") / col("n")
    val slope = when(varx =!= 0.0, cov / varx)
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), Num.davg(abs(bx - by)).as("mae"),
        sx.as("sx"), sy.as("sy"), sxx.as("sxx"), sxy.as("sxy"), syy.as("syy"))
      .select(
        (groupCols.map(col) ++ Seq(
          col("n"), col("mae"),
          slope.as("slope"),
          ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
          (when(varx * vary =!= 0.0, cov * cov / (varx * vary))).as("r2"))): _*)
  }

  /** A6 per-frame error curve (bin/optimize_frame.py:73-96): posexplode the
    * per-row frame array, average per frame index. The explode is narrow;
    * the per-index aggregate is one shuffle keyed on a tiny domain.
    */
  def perIndexMean(df: DataFrame, arr: Column, idCols: Seq[String]): DataFrame =
    df.select(idCols.map(col) :+ posexplode(arr).as(Seq("pos", "v")): _*)
      .groupBy("pos").agg(Num.davg(col("v")).as("mean_v"), count(lit(1)).as("n"))
}
