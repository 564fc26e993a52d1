package graft.parity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Grouped, Num}

/** Entry points 2–3 of the reference (SURVEY §3.2–3.3):
  * `bin/get_parities.py` (model-quality report) and `bin/optimize_frame.py`
  * (relaxation-length tuning). Both are aggregate queries over a
  * validation table (FIXTURES.md §5) and compose entirely from the
  * operator library — one grouped aggregate each, no new primitives.
  */
object Parity {

  /** §3.2 parity report (parity_utils.py:206-243 via :257-300): per
    * (adsorbate, distribution) split — N, MAE, OLS slope/intercept/R² of
    * ML vs DFT energy. Bulk filters are reused on the validation table
    * exactly like the reference reuses `bulk_filter` (:286-287): pass them
    * as pre-filters.
    */
  def parityReport(validation: DataFrame, preFilters: Seq[Column] = Nil): DataFrame = {
    val filtered = preFilters.foldLeft(validation)((df, p) => df.filter(p))
    Grouped.groupedRegression(filtered, Seq("adsorbate", "distribution"),
      col("DFT_energy"), col("ML_energy"))
  }

  /** §3.3 frame optimization (bin/optimize_frame.py:73-96): per-frame
    * MAE/ME across the trajectory array column, then the argmin frame.
    * Returns (curve, bestFrame): curve = per-index stats; bestFrame = the
    * single row minimizing MAE.
    */
  def frameCurve(validation: DataFrame): DataFrame =
    validation
      .select(col("random_id"), col("DFT_energy"),
        posexplode(col("ML_energies")).as(Seq("frame", "e")))
      .groupBy("frame")
      .agg(Num.davg(abs(col("e") - col("DFT_energy"))).as("mae"),
        Num.davg(col("e") - col("DFT_energy")).as("me"),
        count(lit(1)).as("n"))

  def bestFrame(validation: DataFrame): DataFrame =
    frameCurve(validation).orderBy(col("mae"), col("frame")).limit(1)
}
