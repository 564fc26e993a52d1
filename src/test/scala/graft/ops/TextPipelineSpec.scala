package graft.ops

import org.apache.spark.sql.functions.{col, split, transform}
import graft.{SparkTestBase, Tables}
import graft.domain.Pipeline
import graft.functions.StableHash

class TextPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val stageKeys = Seq("tp_00_input", "tp_01_rules", "tp_02_dedup",
    "tp_03_quota", "tp_04_shard")

  test("stage ledger: counts monotonically decrease and every stage bites") {
    val ledger = new Pipeline.Ledger
    spark.listenerManager.register(ledger)
    try {
      val out = TextPipeline.compile(
        Tables.documents(spark, "/root/testdata/sf0.01"))
      val finalCount = out.count()
      // listener delivery is async and per-entry: await EVERY key read below
      stageKeys.foreach(k => assert(ledger.await(k), s"metric $k never landed"))
      val stages = stageKeys.map(ledger.metrics)
      // strictly decreasing through quota: every stage removes something
      // on the sf0.01 corpus (rule filter, fingerprint dedup, source cap
      // are all non-vacuous); shard assignment removes nothing
      assert(stages.sliding(2).take(3).forall { case Seq(a, b) => b < a })
      assert(stages(4) == stages(3) && stages(4) == finalCount)
    } finally spark.listenerManager.unregister(ledger)
  }

  test("shard and pos derive from the seeded hash (independent recomputation)") {
    val rows = TextPipeline.compile(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(rows.nonEmpty)
    // local reimplementation of the 31-ary fold — NOT the Spark expression
    def ph(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % StableHash.P)
    rows.foreach { case (id, shard, _) =>
      assert(shard == (ph(s"shuffle|$id") % 8).toInt, s"doc $id")
    }
    // pos = dense 1..n per shard in (hash, doc_id) order
    rows.groupBy(_._2).foreach { case (_, members) =>
      val expected = members.sortBy { case (id, _, _) => (ph(s"shuffle|$id"), id) }
        .map(_._1)
      val actual = members.sortBy(_._3).map(_._1)
      assert(actual.toSeq == expected.toSeq)
      assert(members.map(_._3).sorted.toSeq == (1 to members.length))
    }
  }

  test("per-row simhash column equals the grouped-aggregate form") {
    val docs = Seq((1L, "a b a c d"), (2L, "x y z w"), (3L, "a a a a"))
      .toDF("doc_id", "text")
    val grouped = Dedup.simhash(docs, "doc_id", col("text"), 16)
      .as[(Long, Long)].collect().toMap
    val perRow = docs.select(col("doc_id"),
      Dedup.simhashCol(
        transform(split(col("text"), " "), t => StableHash.polyHash(t)), 16)
        .as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(grouped == perRow)
  }
}
