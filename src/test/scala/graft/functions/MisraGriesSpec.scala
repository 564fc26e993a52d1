package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  test("MG guarantee: items above N/(capacity+1) survive distributed merges") {
    // skewed stream: "hot" is 40% of N, tail spread over 50 keys — with
    // capacity 8, the guarantee threshold is N/9 ≈ 11%, so "hot" MUST be
    // in the summary however Spark partitions/merges; tail keys churn
    // through the decrement path (vocab 51 ≫ capacity 8)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val toks = (0 until 25).map(_ =>
        if (rnd.nextDouble() < 0.4) "hot" else s"t${rnd.nextInt(50)}")
      toks
    }
    val n = rows.map(_.size).sum
    val trueCounts = rows.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(trueCounts("hot") > n / 9) // the premise

    // 8 partitions → 8 partial summaries merged in engine-chosen order
    val mg = new MisraGries.Summary(8).toColumn
    val summary = rows.toDF("tokens").repartition(8)
      .as[Seq[String]].select(mg).collect()(0)
    assert(summary.contains("hot"), s"hot missing from $summary")
    assert(summary.size <= 8)
    // count understates by at most N/(capacity+1)
    assert(summary("hot") <= trueCounts("hot").toLong &&
      summary("hot") >= trueCounts("hot").toLong - n / 9)
  }

  test("generate-then-verify pipeline equals the exact groupBy-HAVING answer") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 300).map { _ =>
      (0 until 20).map(_ =>
        if (rnd.nextDouble() < 0.25) "alpha"
        else if (rnd.nextDouble() < 0.3) "beta" else s"w${rnd.nextInt(40)}")
        .mkString(" ")
    }.toDF("text")
    val mg = new MisraGries.Summary(64).toColumn // 64 > vocab: candidates exact
    val cand = docs.select(split(col("text"), " ").as("tokens"))
      .as[Seq[String]].select(mg).toDF("mg")
      .select(explode(map_keys(col("mg"))).as("token"))
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val total = toks.count()
    val got = toks.join(broadcast(cand), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 16 >= total)
      .as[(String, Long)].collect().toMap
    val want = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 16 >= total)
      .as[(String, Long)].collect().toMap
    assert(got == want && got.nonEmpty, s"got $got")
  }
}
