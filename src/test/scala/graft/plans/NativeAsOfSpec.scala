package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase
import graft.ops.AsOfJoin

/** The native AsOfJoinExec must bit-reproduce the composed union+window
  * form (which itself hash-matches DuckDB's ASOF JOIN at the gate).
  */
class NativeAsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("native as-of picks the nearest previous right row per key") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 110.0), (2L, 5L, 50.0))
      .toDF("k", "qt", "price")
    val trades = Seq((1L, 15L, "a"), (1L, 25L, "b"), (1L, 5L, "c"), (2L, 5L, "d"))
      .toDF("k", "tt", "trade")
    val out = NativeAsOf.asofJoin(trades, quotes, Seq("k"), "tt", "qt",
        Seq("price" -> "price"))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(100.0))  // 15 → quote@10
    assert(out("b").contains(110.0))  // 25 → quote@20
    assert(out("c").isEmpty)          // 5 → no prior quote for k=1
    assert(out("d").contains(50.0))   // equal time matches (>= semantics)
  }

  test("null right times skipped; null left time matches nothing") {
    val quotes = Seq((1L, Option.empty[Long], 99.0), (1L, Some(10L), 100.0))
      .toDF("k", "qt", "price")
    val trades = Seq((1L, Some(5L), "early"), (1L, Some(15L), "late"),
        (1L, Option.empty[Long], "nul"))
      .toDF("k", "tt", "trade")
    val out = NativeAsOf.asofJoin(trades, quotes, Seq("k"), "tt", "qt",
        Seq("price" -> "price"))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(out("early").isEmpty && out("nul").isEmpty)
    assert(out("late").contains(100.0))
  }

  test("matched row's NULL carry stays NULL; multi-carry never mixes rows") {
    val quotes = Seq((1L, 5L, Some(50.0), "x"), (1L, 10L, Option.empty[Double], "y"))
      .toDF("k", "qt", "price", "src")
    val trades = Seq((1L, 15L, "a"), (1L, 7L, "b")).toDF("k", "tt", "trade")
    val out = NativeAsOf.asofJoin(trades, quotes, Seq("k"), "tt", "qt",
        Seq("price" -> "price", "src" -> "src"))
      .select("trade", "price", "src")
      .as[(String, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // physical guarantee: both carries come from ONE projected right row
    assert(out("a") == ((None, Some("y"))))
    assert(out("b") == ((Some(50.0), Some("x"))))
  }

  test("property: native == composed union+window form on random data") {
    val keys = Gen.choose(0L, 5L)
    val times = Gen.choose(0L, 50L)
    val gen = for {
      nl <- Gen.choose(0, 60)
      nr <- Gen.choose(0, 60)
      ls <- Gen.listOfN(nl, Gen.zip(keys, times))
      rs <- Gen.listOfN(nr, Gen.zip(keys, times))
    } yield (ls, rs)
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "lt", "lid")
      // right unique per (k, t) — the operator precondition
      val right = rs.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong * 10) }.toDF("k", "rt", "rv")
      val native = NativeAsOf.asofJoin(left, right, Seq("k"), "lt", "rt",
          Seq("rv" -> "rv"))
        .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
      val composed = AsOfJoin.asofJoin(left, right, Seq("k"),
          col("lt"), col("rt"), Seq("rv" -> col("rv")))
        .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
      native == composed
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop).passed)
  }

  test("plan: AsOfJoinExec node, no window, no union; exchange reused downstream") {
    val n = 2000
    val left = (1 to n).map(i => (i % 37L, i.toLong, i.toLong)).toDF("k", "lt", "lid")
    val right = (1 to n).map(i => (i % 37L, i * 2L, i * 10L)).toDF("k", "rt", "rv")
    val joined = NativeAsOf.asofJoin(left, right, Seq("k"), "lt", "rt",
      Seq("rv" -> "rv"))
    val p = joined.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints as AsOfJoin
    assert(p.contains("AsOfJoin ["), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("Window") && !p.contains("Union"))
    // outputPartitioning = left's hash partitioning on k: a downstream
    // groupBy("k") must NOT plan a third exchange
    val agg = joined.groupBy("k").agg(max("rv").as("m"))
    val pa = agg.queryExecution.executedPlan.toString
    val exchanges = pa.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected 2 exchanges (join inputs only), got $exchanges:\n$pa")
    // and the result itself is right (vs composed form)
    val a = agg.as[(Long, Long)].collect().toMap
    val b = AsOfJoin.asofJoin(left, right, Seq("k"), col("lt"), col("rt"),
        Seq("rv" -> col("rv")))
      .groupBy("k").agg(max("rv").as("m")).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("self-join: both sides derived from one scan (shared exprIds)") {
    // the ao4 corpus shape: left and right are filters of the SAME frame,
    // so their analyzed plans share attribute exprIds — regression for the
    // duplicate-id column-pruning crash (DeduplicateRelations equivalent)
    val ev = (1 to 200)
      .map(i => (i % 5L, i.toLong, if (i % 2 == 0) "c" else "e"))
      .toDF("k", "t", "typ")
    val l = ev.filter(col("typ") === "e")
      .select(col("k"), col("t").as("lt"), col("t").as("lid"))
    val r = ev.filter(col("typ") === "c")
      .select(col("k"), col("t").as("rt"), (col("t") * 10).as("rv"))
    val native = NativeAsOf.asofJoin(l, r, Seq("k"), "lt", "rt",
        Seq("rv" -> "rv"))
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    val composed = AsOfJoin.asofJoin(l, r, Seq("k"), col("lt"), col("rt"),
        Seq("rv" -> col("rv")))
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(native == composed && native.nonEmpty)
  }

  test("forward native == forward composed (earliest right >= left time)") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 110.0), (2L, 5L, 50.0))
      .toDF("k", "qt", "price")
    val trades = Seq((1L, 15L, "a"), (1L, 25L, "b"), (1L, 5L, "c"), (2L, 5L, "d"))
      .toDF("k", "tt", "trade")
    val native = NativeAsOf.asofJoinForward(trades, quotes, Seq("k"), "tt", "qt",
        Seq("price" -> "price"))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    val composed = AsOfJoin.asofJoinForward(trades, quotes, Seq("k"),
        col("tt"), col("qt"), Seq("price" -> col("price")))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(native == composed)
    assert(native("a").contains(110.0) && native("b").isEmpty &&
      native("c").contains(100.0) && native("d").contains(50.0))
  }

  test("tolerance: stale matches null out; native == composed") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 40L, 110.0), (2L, 5L, 50.0))
      .toDF("k", "qt", "price")
    val trades = Seq((1L, 15L, "near"), (1L, 39L, "stale"), (1L, 45L, "refresh"),
        (2L, 4L, "none"))
      .toDF("k", "tt", "trade")
    // tol = 10: trade@15 matches quote@10 (gap 5); trade@39's latest quote
    // is @10 (gap 29 > 10 → NULL — a younger in-window quote cannot exist,
    // the nulled match was the latest); trade@45 matches quote@40 (gap 5);
    // k=2 trade@4 has no prior quote at all → NULL either way
    val native = NativeAsOf.asofJoinTolerance(trades, quotes, Seq("k"),
        "tt", "qt", lit(10L), Seq("price" -> "price"))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    val composed = AsOfJoin.asofJoinTolerance(trades, quotes, Seq("k"),
        col("tt"), col("qt"), lit(10L), Seq("price" -> col("price")))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(native == composed)
    assert(native == Map("near" -> Some(100.0), "stale" -> None,
      "refresh" -> Some(110.0), "none" -> None))
  }

  test("composite key: prefix comparator covers all key positions") {
    val quotes = Seq(("a", 1L, 10L, 100.0), ("a", 2L, 10L, 200.0),
        ("b", 1L, 10L, 300.0))
      .toDF("k1", "k2", "qt", "price")
    val trades = Seq(("a", 1L, 15L, "x"), ("a", 2L, 15L, "y"),
        ("b", 1L, 5L, "z"), ("b", 2L, 15L, "w"))
      .toDF("k1", "k2", "tt", "trade")
    val native = NativeAsOf.asofJoin(trades, quotes, Seq("k1", "k2"),
        "tt", "qt", Seq("price" -> "price"))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(native == Map("x" -> Some(100.0), "y" -> Some(200.0),
      "z" -> None, "w" -> None))
  }

  test("bucketed inputs: native as-of plans exchange-free (and sort-free)") {
    // THE capability the union+window form cannot express: AsOfJoinExec
    // declares its distribution/ordering as REQUIREMENTS, so inputs
    // bucketed by the key and in-bucket sorted by (key, time) satisfy them
    // straight off the scan — zero exchanges, zero sorts
    Seq("asof_bl", "asof_br").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    val left = (1 to 1000).map(i => (i % 13L, i.toLong, i.toLong))
      .toDF("k", "lt", "lid")
    val right = (1 to 1000).map(i => (i % 13L, i * 2L, i * 10L))
      .toDF("k", "rt", "rv")
    graft.ops.Bucketing.writeBucketedSorted(left, "asof_bl", "k", Seq("k", "lt"), 4)
    graft.ops.Bucketing.writeBucketedSorted(right, "asof_br", "k", Seq("k", "rt"), 4)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = NativeAsOf.asofJoin(spark.table("asof_bl"),
        spark.table("asof_br"), Seq("k"), "lt", "rt", Seq("rv" -> "rv"))
      val rows = joined.select("lid", "rv").as[(Long, Option[Long])]
        .collect().toMap
      val expected = AsOfJoin.asofJoin(left, right, Seq("k"),
          col("lt"), col("rt"), Seq("rv" -> col("rv")))
        .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
      assert(rows == expected)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.split("\n").count(l =>
        l.contains("Exchange") && !l.contains("Reused"))
      assert(exchanges == 0, s"bucketed as-of must not shuffle:\n$plan")
      assert(!plan.linesIterator.exists(_.trim.matches("[:+]- Sort \\[.*")),
        s"sorted single-file buckets must not re-sort:\n$plan")
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS asof_bl")
      spark.sql("DROP TABLE IF EXISTS asof_br")
    }
  }

  test("missing column and carry-name collision fail loudly") {
    val l = Seq((1L, 1L, "a")).toDF("k", "lt", "trade")
    val r = Seq((1L, 1L, 1.0)).toDF("k", "rt", "price")
    val e1 = intercept[IllegalArgumentException] {
      NativeAsOf.asofJoin(l, r, Seq("k"), "lt", "nope", Seq("price" -> "price"))
    }
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException] {
      NativeAsOf.asofJoin(l, r, Seq("k"), "lt", "rt", Seq("trade" -> "price"))
    }
    assert(e2.getMessage.contains("trade"))
  }
}
