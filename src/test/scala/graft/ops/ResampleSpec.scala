package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Edge semantics of the grid resampler beyond what the e11/e12 gate
  * queries exercise: slot alignment, pre-first-point nulls, single-point
  * keys, and carry-expression materialization.
  */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("grid spans floor(min/step)..floor(max/step); slots before first point are null") {
    // key 1: points at t=25, 47 with step 10 → slots 20, 30, 40
    // (slot 20 < 25 → null; 30, 40 carry the t=25 point... then 47 unseen
    // until a slot ≥ 47 — which is 40? no: floor(47/10)=4 → slots 2,3,4 →
    // slot 40 still carries t=25; 47 is never at/below a slot
    val pts = Seq((1L, 25L, 2.5), (1L, 47L, 4.7)).toDF("k", "t", "v")
    val out = Resample.gridFfill(pts, Seq("k"), "t", 10L,
        Seq("vf" -> col("v")))
      .select("t_grid", "vf").as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((20L, None), (30L, Some(2.5)), (40L, Some(2.5))))
  }

  test("a point exactly on a slot matches that slot (>= semantics)") {
    val pts = Seq((1L, 30L, 3.0)).toDF("k", "t", "v")
    val out = Resample.gridFfill(pts, Seq("k"), "t", 10L,
        Seq("vf" -> col("v")))
      .select("t_grid", "vf").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((30L, Some(3.0))))
  }

  test("keys resample independently; carry expressions materialize per point") {
    val pts = Seq((1L, 5L, 1.0), (1L, 19L, 2.0), (2L, 12L, 9.0))
      .toDF("k", "t", "v")
    // carry a derived expression (v * 10) — must be evaluated on the
    // POINT rows before the native join projects it by attribute
    val out = Resample.gridFfill(pts, Seq("k"), "t", 10L,
        Seq("v10" -> (col("v") * 10)))
      .select("k", "t_grid", "v10").as[(Long, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 0L, None), (1L, 10L, Some(10.0)),
      (2L, 10L, None)))
  }
}
