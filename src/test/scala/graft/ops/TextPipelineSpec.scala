package graft.ops

import graft.{SparkTestBase, Tables}
import graft.domain.Pipeline

class TextPipelineSpec extends SparkTestBase {

  test("stage ledger: counts monotonically decrease and every stage bites") {
    val ledger = new Pipeline.Ledger
    spark.listenerManager.register(ledger)
    try {
      val out = TextPipeline.compile(
        Tables.documents(spark, "/root/testdata/sf0.01"))
      val finalCount = out.count()
      assert(ledger.await("tp_04_shard"))
      val stages = Seq("tp_00_input", "tp_01_rules", "tp_02_dedup",
        "tp_03_quota", "tp_04_shard").map(ledger.metrics)
      // strictly decreasing through quota: every stage removes something
      // on the sf0.01 corpus (rule filter, fingerprint dedup, source cap
      // are all non-vacuous); shard assignment removes nothing
      assert(stages.sliding(2).take(3).forall { case Seq(a, b) => b < a })
      assert(stages(4) == stages(3) && stages(4) == finalCount)
    } finally spark.listenerManager.unregister(ledger)
  }

  test("sharding is a permutation: positions are dense per shard") {
    val out = TextPipeline.compile(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    import spark.implicits._
    val perShard = out.groupBy("shard")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("pos").as("maxp"))
      .as[(Int, Long, Int)].collect()
    assert(perShard.nonEmpty)
    perShard.foreach { case (_, n, maxp) => assert(n == maxp) }
  }
}
