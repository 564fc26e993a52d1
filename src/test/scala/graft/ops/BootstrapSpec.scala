package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the three synchronized Poisson-bootstrap weight implementations
  * to each other (Column expression, JVM-local fold, and — via the ab3
  * oracle gate — the DuckDB SQL twin), plus the distributional sanity the
  * statistic rests on.
  */
class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  test("weightCol and weightLocal agree on every (id, replicate)") {
    val ids = (1L to 200L) ++ Seq(0L, 999999937L, Long.MaxValue / 3)
    val rows = for (id <- ids; b <- 0 until Bootstrap.B) yield (id, b)
    val got = rows.toDF("id", "b")
      .select(col("id"), col("b"),
        Bootstrap.weightCol(col("id"), col("b")).cast("int").as("w"))
      .as[(Long, Int, Int)].collect()
    assert(got.length == rows.length)
    got.foreach { case (id, b, w) =>
      assert(w == Bootstrap.weightLocal(id, b), s"id=$id b=$b")
    }
  }

  test("thresholds are strictly increasing and the weight range is 0..5") {
    assert(Bootstrap.cuts.size == 5)
    assert(Bootstrap.cuts == Bootstrap.cuts.sorted)
    assert(Bootstrap.cuts.distinct.size == 5)
    val ws = for (id <- 1L to 500L; b <- 0 until Bootstrap.B)
      yield Bootstrap.weightLocal(id, b)
    assert(ws.forall(w => w >= 0 && w <= 5))
  }

  test("weights are Poisson(1)-shaped: mean ~1, P(0) ~ 1/e (deterministic)") {
    val n = 20000
    val ws = for (id <- 1L to (n / Bootstrap.B).toLong;
                  b <- 0 until Bootstrap.B)
      yield Bootstrap.weightLocal(id, b)
    val mean = ws.sum.toDouble / ws.size
    val p0 = ws.count(_ == 0).toDouble / ws.size
    assert(math.abs(mean - 1.0) < 0.03, s"mean=$mean")
    assert(math.abs(p0 - math.exp(-1.0)) < 0.02, s"p0=$p0")
  }

  test("replicate sums concentrate: each replicate's n_eff is near n") {
    val n = 2000
    val byB = (0 until Bootstrap.B).map { b =>
      (1L to n.toLong).map(id => Bootstrap.weightLocal(id, b).toLong).sum
    }
    byB.foreach { s =>
      assert(math.abs(s - n) < 5 * math.sqrt(n.toDouble), s"n_eff=$s vs n=$n")
    }
  }

  test("cross-replicate independence: adjacent-replicate weight corr ~ 0") {
    // the affine-in-b mixing this guards against had corr(w_b, w_{b+1})
    // ≈ -0.35 for EVERY adjacent pair (constant inter-replicate step)
    val n = 5000
    val w = Array.tabulate(Bootstrap.B)(b =>
      (1L to n.toLong).map(id => Bootstrap.weightLocal(id, b).toDouble).toArray)
    def corr(x: Array[Double], y: Array[Double]): Double = {
      val mx = x.sum / n; val my = y.sum / n
      val cov = (0 until n).map(i => (x(i) - mx) * (y(i) - my)).sum
      val vx = x.map(v => (v - mx) * (v - mx)).sum
      val vy = y.map(v => (v - my) * (v - my)).sum
      cov / math.sqrt(vx * vy)
    }
    (0 until Bootstrap.B - 1).foreach { b =>
      val c = corr(w(b), w(b + 1))
      assert(math.abs(c) < 0.08, s"corr(w_$b, w_${b + 1}) = $c")
    }
  }

  test("replicate n_eff spread is Poisson-like (~sqrt(n)), not degenerate") {
    // the affine-in-b scheme made each replicate's weight multiset a
    // constant-shift permutation of the same sequence — sd(n_eff) ~ 100x
    // below the sqrt(n) a true Poisson bootstrap needs for count CIs
    val n = 5000
    val byB = (0 until Bootstrap.B).map { b =>
      (1L to n.toLong).map(id => Bootstrap.weightLocal(id, b).toLong).sum
        .toDouble
    }
    val mean = byB.sum / byB.size
    val sd = math.sqrt(byB.map(s => (s - mean) * (s - mean)).sum /
      (byB.size - 1))
    val expect = math.sqrt(n.toDouble) // Var(n_eff) = n for Poisson(1)
    assert(sd > 0.4 * expect && sd < 2.5 * expect,
      s"sd(n_eff)=$sd vs sqrt(n)=$expect — replicate distribution degenerate")
  }
}
