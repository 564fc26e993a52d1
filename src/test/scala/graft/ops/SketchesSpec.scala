package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("approxDistinct within rsd of exact on skewed groups") {
    // group a: 10k distinct; group b: 100 distinct, heavily repeated
    val rows = (1 to 10000).map(i => ("a", s"v$i")) ++
      (1 to 10000).map(i => ("b", s"v${i % 100}"))
    val df = rows.toDF("g", "v")
    val exact = df.groupBy("g").agg(countDistinct("v").as("n"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.approxDistinct(df, Seq("g"), col("v"), rsd = 0.02)
      .as[(String, Long)].collect().toMap
    for ((g, n) <- exact) {
      val a = approx(g).toDouble
      // HLL++ at rsd=0.02: allow 3 sigma
      assert(math.abs(a - n) / n <= 0.06, s"group $g: approx $a vs exact $n")
    }
  }

  test("approxQuantiles ranks within n/accuracy of exact") {
    val n = 20000
    val df = (1 to n).map(i => ("g", i.toDouble)).toDF("g", "v")
    val probs = Seq(0.1, 0.5, 0.99)
    val got = Sketches.approxQuantiles(df, Seq("g"), col("v"), probs,
        accuracy = 1000)
      .select("quantiles").as[Seq[Double]].head()
    probs.zip(got).foreach { case (p, q) =>
      // rank error ≤ n/accuracy = 20 positions; values are 1..n so the
      // value error bound equals the rank bound here
      assert(math.abs(q - p * n) <= n / 1000.0 + 1,
        s"p$p: got $q, want ~${p * n}")
    }
  }

  test("sketch aggregates keep partial (map-side) aggregation") {
    val df = (1 to 1000).map(i => (i % 7, i.toString)).toDF("g", "v")
    val plan = Sketches.approxDistinct(df, Seq("g"), col("v"))
      .queryExecution.executedPlan.toString
    // two HashAggregates (partial + final) around one exchange: the sketch
    // merges map-side instead of shuffling raw values
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
