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

  test("t20 weighted sample: ES draw matches independent recomputation, " +
    "inclusion grows with weight") {
    val sf = "/root/testdata/sf0.01"
    val drawn = graft.SparkEntry.queries("t20_weighted_sample")(spark, sf)
      .select("doc_id", "wt").as[(Long, Double)].collect()
    assert(drawn.length == 200)
    // inclusion count strictly increases with weight (the point of ES over
    // a uniform quota): each tier has 125 corpus docs
    val byW = drawn.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byW.keySet == Set(1.0, 2.0, 3.0, 4.0))
    assert(Seq(1.0, 2.0, 3.0).forall(w => byW(w) < byW(w + 1)))
    // independent local recomputation of the whole draw (plain Scala, not
    // the Spark expression tree): same hash fold, affine rehash, key, and
    // 6-decimal HALF_UP pin, sorted by (key, doc_id), first 200
    def ph(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % StableHash.P)
    val (a, b) = StableHash.affineParams(1).head
    val corpus = Tables.documents(spark, sf)
      .select("doc_id", "source").as[(Long, String)].collect()
    val local = corpus.map { case (id, src) =>
      val w = ("""\d+""".r.findFirstIn(src).get.toInt % 4) + 1
      val h2 = (ph(s"wsamp|$id") * a + b) % StableHash.P
      val u = (h2.toDouble + 1.0) / (StableHash.P + 1).toDouble
      val skey = BigDecimal(-math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (skey, id)
    }.sortBy(identity).take(200).map(_._2).toSet
    assert(drawn.map(_._1).toSet == local)
  }

  test("t19 unigram log-prob: doc scores match an independent local LM") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("t19_unigram_logprob")(spark, sf)
      .select("doc_id", "n_tokens", "lp_sum")
      .as[(Long, Long, Double)].collect()
    val corpus = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val tTotal = cnt.values.map(_.toLong).sum
    val vocab = cnt.size
    def lp(tk: String): BigDecimal =
      BigDecimal(math.log((cnt(tk) + 1.0) / (tTotal.toDouble + vocab)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val localById = toks.map { case (id, ts) =>
      id -> (ts.size.toLong, ts.map(lp).sum.toDouble)
    }.toMap
    assert(out.nonEmpty)
    out.foreach { case (id, n, s) =>
      assert((n, s) == localById(id), s"doc $id")
    }
  }
}
