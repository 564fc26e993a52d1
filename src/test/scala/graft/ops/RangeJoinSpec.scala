package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  // Naive references: exact semantics via a plain (quadratic) join.
  private def naivePoint(points: Seq[(Long, Double)],
                         ivs: Seq[(Long, Double, Double)]): Set[(Long, Long)] =
    (for ((pid, v) <- points; (iid, lo, hi) <- ivs if v >= lo && v < hi)
      yield (pid, iid)).toSet

  private def naiveOverlap(ls: Seq[(Long, Double, Double)],
                           rs: Seq[(Long, Double, Double)]): Set[(Long, Long)] =
    (for ((lid, llo, lhi) <- ls; (rid, rlo, rhi) <- rs
          if llo <= rhi && rlo <= lhi) yield (lid, rid)).toSet

  test("pointInInterval matches the naive join, incl. bin-boundary points") {
    // points sit ON bin boundaries (multiples of 10 with binWidth=10) and
    // interval ends land exactly on boundaries too — the classic off-by-one
    // surface of bucketized range joins
    val points = Seq[(Long, Double)](
      (1, 0.0), (2, 10.0), (3, 9.999), (4, 20.0), (5, 35.5), (6, -5.0),
      (7, 50.0), (8, 49.999), (9, -0.001))
    val ivs = Seq[(Long, Double, Double)](
      (100, 0.0, 10.0), (101, 10.0, 30.0), (102, 5.0, 50.0),
      (103, -10.0, 0.0), (104, 49.999, 50.0))
    val got = RangeJoin.pointInInterval(
        points.toDF("pid", "v"), col("v"),
        ivs.toDF("iid", "lo", "hi"), col("lo"), col("hi"), binWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naivePoint(points, ivs))
  }

  test("pointInInterval emits each qualifying pair exactly once") {
    // interval spanning many bins: the point must match once, not per-bin
    val got = RangeJoin.pointInInterval(
        Seq((1L, 55.0)).toDF("pid", "v"), col("v"),
        Seq((9L, 0.0, 1000.0)).toDF("iid", "lo", "hi"),
        col("lo"), col("hi"), binWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 9L)))
  }

  test("intervalOverlap matches the naive join exactly-once, incl. touching ends") {
    val ls = Seq[(Long, Double, Double)](
      (1, 0.0, 10.0), (2, 10.0, 20.0), (3, 5.0, 95.0), (4, -30.0, -20.0),
      (5, 40.0, 40.0)) // degenerate zero-length interval
    val rs = Seq[(Long, Double, Double)](
      (100, 10.0, 10.0), // touches l1 end and l2 start exactly
      (101, 0.0, 100.0), (102, 90.0, 95.0), (103, -25.0, -25.0))
    val got = RangeJoin.intervalOverlap(
        ls.toDF("lid", "llo", "lhi"), col("llo"), col("lhi"),
        rs.toDF("rid", "rlo", "rhi"), col("rlo"), col("rhi"), binWidth = 10.0)
      .select("lid", "rid").as[(Long, Long)].collect()
    // exactly-once: no pair may appear twice even though both sides
    // replicate across many shared bins (e.g. l3 × r101 share 10 bins)
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet === naiveOverlap(ls, rs))
  }

  test("reversed intervals are dropped, not replicated across bins") {
    val got = RangeJoin.pointInInterval(
        Seq((1L, 5.0)).toDF("pid", "v"), col("v"),
        Seq((9L, 100.0, 0.0), (10L, 0.0, 10.0)).toDF("iid", "lo", "hi"),
        col("lo"), col("hi"), binWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L)))
  }

  test("property: both joins agree with the naive reference on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // values around bin boundaries on purpose: multiples of the 10.0 bin
    // width, tiny offsets, negatives
    val genV = Gen.chooseNum(-5, 8).flatMap(k =>
      Gen.oneOf(k * 10.0, k * 10.0 + 0.001, k * 10.0 - 0.001, k * 10.0 + 5.0))
    val genIv = for { a <- genV; b <- genV } yield (math.min(a, b), math.max(a, b))
    val genCase = for {
      ps <- Gen.listOfN(12, genV)
      ivs <- Gen.listOfN(8, genIv)
    } yield (ps, ivs)
    val prop = Prop.forAll(genCase) { case (ps, ivs) =>
      val points = ps.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val intervals = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      val gotP = RangeJoin.pointInInterval(
          points.toDF("pid", "v"), col("v"),
          intervals.toDF("iid", "lo", "hi"), col("lo"), col("hi"), 10.0)
        .select("pid", "iid").as[(Long, Long)].collect()
      val gotO = RangeJoin.intervalOverlap(
          intervals.toDF("lid", "llo", "lhi"), col("llo"), col("lhi"),
          intervals.toDF("rid", "rlo", "rhi"), col("rlo"), col("rhi"), 10.0)
        .select("lid", "rid").as[(Long, Long)].collect()
      gotP.toSet == naivePoint(points, intervals) &&
        gotP.length == gotP.toSet.size &&
        gotO.toSet == naiveOverlap(intervals, intervals) &&
        gotO.length == gotO.toSet.size
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop).passed)
  }

  test("binned plan is an equi-join — no nested-loop/cartesian fallback") {
    val p = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "v")
    val iv = (1 to 50).map(i => (i.toLong, i * 2.0, i * 2.0 + 5.0))
      .toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(p, col("v"), iv, col("lo"), col("hi"),
        binWidth = 8.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a quadratic plan:\n$plan")
  }
}
