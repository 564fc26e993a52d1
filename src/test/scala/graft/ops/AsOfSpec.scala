package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join picks the nearest previous right row per key") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 110.0), (2L, 5L, 50.0))
      .toDF("k", "qt", "price")
    val trades = Seq((1L, 15L, "a"), (1L, 25L, "b"), (1L, 5L, "c"), (2L, 5L, "d"))
      .toDF("k", "tt", "trade")
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"),
      col("tt"), col("qt"), Seq("price" -> col("price")))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(100.0))  // 15 → quote@10
    assert(out("b").contains(110.0))  // 25 → quote@20
    assert(out("c").isEmpty)          // 5 → no prior quote for k=1
    assert(out("d").contains(50.0))   // equal time matches (>= semantics)
  }

  test("null right times never match (DuckDB ASOF semantics)") {
    val quotes = Seq((1L, Option.empty[Long], 99.0), (1L, Some(10L), 100.0))
      .toDF("k", "qt", "price")
    val trades = Seq((1L, 5L, "early"), (1L, 15L, "late")).toDF("k", "tt", "trade")
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"),
      col("tt"), col("qt"), Seq("price" -> col("price")))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    // the null-time quote must not be carried into the unmatched early row
    assert(out("early").isEmpty)
    assert(out("late").contains(100.0))
    val fwd = AsOfJoin.asofJoinForward(trades, quotes, Seq("k"),
      col("tt"), col("qt"), Seq("price" -> col("price")))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(fwd("early").contains(100.0))
    assert(fwd("late").isEmpty)
  }

  test("a matched right row's NULL carry stays NULL (no older-row leak)") {
    val quotes = Seq((1L, 5L, Some(50.0), "x"), (1L, 10L, Option.empty[Double], "y"))
      .toDF("k", "qt", "price", "src")
    val trades = Seq((1L, 15L, "a"), (1L, 7L, "b")).toDF("k", "tt", "trade")
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("k"),
      col("tt"), col("qt"), Seq("price" -> col("price"), "src" -> col("src")))
      .select("trade", "price", "src")
      .as[(String, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // t=15 matches quote@10: its price is NULL and must STAY null; both
    // carries must come from the same (t=10) row — no (50.0, "y") mixing
    assert(out("a") == ((None, Some("y"))))
    assert(out("b") == ((Some(50.0), Some("x"))))
  }

  test("carry names colliding with internal scratch columns fail loudly") {
    val quotes = Seq((1L, 10L, 1.0)).toDF("k", "qt", "price")
    val trades = Seq((1L, 15L, "a")).toDF("k", "tt", "trade")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(trades, quotes, Seq("k"),
        col("tt"), col("qt"), Seq("__cc" -> col("price")))
    }
    assert(e.getMessage.contains("__cc"))
  }

  test("as-of join uses one shuffle on the key (no range explosion)") {
    val quotes = Seq((1L, 10L, 1.0)).toDF("k", "qt", "price")
    val trades = Seq((1L, 15L, "a")).toDF("k", "tt", "trade")
    val plan = AsOfJoin.asofJoin(trades, quotes, Seq("k"),
      col("tt"), col("qt"), Seq("price" -> col("price")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("salted aggregate equals the direct aggregate") {
    val df = (1 to 1000).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"))
      .as[(String, Long)].collect().toMap
    val salted = SaltedAgg.saltedSum(df, Seq("k"), col("v"), "s", 16)
      .as[(String, Long)].collect().toMap
    assert(direct == salted)
  }
}
