package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Parity + plan shape for [[CollectSortedLongsAgg]], the primitive
  * spelling of `sort_array(collect_list(x))` used by the tri_base
  * adjacency build.
  */
class CollectSortedAggSpec extends SparkTestBase {

  private def pairs(n: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // skewed group sizes (hub-like), duplicate values kept
    (1 to n).map { _ =>
      val g = (rnd.nextInt(40) * rnd.nextInt(40) / 40).toLong
      (g, rnd.nextInt(1000).toLong)
    }.toDF("g", "v")
  }

  test("matches sort_array(collect_list) exactly, duplicates kept") {
    val df = pairs(20000, seed = 7).persist()
    val ref = df.groupBy("g")
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    val got = df.groupBy("g")
      .agg(CollectSortedLongsAgg.collectSorted(col("v")).as("nbrs"))
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
    df.unpersist()
  }

  test("nulls are dropped, empty groups yield empty arrays") {
    import spark.implicits._
    val df = Seq((1L, Some(3L)), (1L, None), (1L, Some(1L)), (2L, None))
      .toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(CollectSortedLongsAgg.collectSorted(col("v")).as("nbrs"))
      .orderBy("g").collect()
    assert(rows(0).getSeq[Long](1) == Seq(1L, 3L))
    assert(rows(1).getSeq[Long](1) == Seq.empty)
  }

  test("serialize/deserialize round-trips partial buffers") {
    val agg = CollectSortedLongsAgg(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(0L)))
    val buf = new LongVec
    Seq(5L, 2L, 9L, 2L).foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedValues.toSeq == Seq(2L, 2L, 5L, 9L))
  }

  test("runs under ObjectHashAggregate with no codegen break") {
    val df = pairs(100, seed = 1)
    val plan = df.groupBy("g")
      .agg(CollectSortedLongsAgg.collectSorted(col("v")).as("nbrs"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
  }
}
