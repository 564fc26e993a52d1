package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the sort-based run-length top-k pass (gt5's tail): exact counts,
  * marker exclusion, (count desc, key asc) tie order, and the per-partition
  * output bound.
  */
class TopPairsSpec extends SparkTestBase {
  import spark.implicits._

  private def pack(key: Long, tag: Int): Long = key * 2 + tag

  test("counts runs exactly, drops marked keys, orders ties by key asc") {
    // key 10: 3 instances; key 11: 3 instances but marked (must vanish);
    // key 12: 2; key 13: 3 (ties key 10 — smaller key wins in the global
    // order); key 14: 1; marker for key 99 with no instances: no output
    val rows =
      Seq.fill(3)(pack(13, 1)) ++ Seq.fill(3)(pack(10, 1)) ++
        Seq(pack(11, 0)) ++ Seq.fill(3)(pack(11, 1)) ++
        Seq.fill(2)(pack(12, 1)) ++ Seq(pack(14, 1), pack(99, 0))
    val got = TopPairs
      .runLengthTopK(spark, rows.toDF("k"), 3)
      .toDF("key", "n")
      .orderBy(col("n").desc, col("key"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 3L), (13L, 3L), (12L, 2L)), got.toString)
  }

  test("k bounds the per-partition output; global winners survive any split") {
    // 100 keys with multiplicity = key (key i appears i times); top-5 must
    // be 100..96 regardless of how the shuffle scatters runs
    val rows = (1L to 100L).flatMap(i => Seq.fill(i.toInt)(pack(i, 1)))
    val out = TopPairs.runLengthTopK(spark, rows.toDF("k"), 5)
    val got = out.toDF("key", "n")
      .orderBy(col("n").desc).limit(5)
      .as[(Long, Long)].collect().toSeq
    assert(got == (100L to 96L by -1).map(i => (i, i)).toSeq, got.toString)
    val perPart = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.forall(_ <= 5), perPart.mkString(","))
  }

  test("a marker anywhere in the run excludes it (markers sort first)") {
    val rows = Seq(pack(7, 1), pack(7, 1), pack(7, 0), pack(8, 1))
    val got = TopPairs.runLengthTopK(spark, rows.toDF("k"), 10)
      .collect().toSeq.sorted
    assert(got == Seq((8L, 1L)), got.toString)
  }
}
