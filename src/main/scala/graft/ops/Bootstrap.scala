package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Seeded Poisson bootstrap — the resampling scheme that actually works at
  * 100 TB.
  *
  * A classic bootstrap resamples n rows WITH replacement B times, which
  * needs global coordination (each replicate is a multinomial over all
  * rows — impossible to evaluate row-locally on a distributed scan). The
  * Poisson bootstrap replaces the multinomial with per-row independent
  * Poisson(1) weights: replicate b weights row i by w ~ Poisson(1), and
  * sum(w) concentrates at n, so replicate statistics converge to the same
  * distribution. Every weight is a pure function of (row id, replicate id)
  * — row-local, shuffle-free, and deterministic here because the "random"
  * uniform is a seeded affine hash (the f12b/t20/pv4 discipline), so the
  * DuckDB oracle reproduces every weight exactly.
  *
  * Replicate mixing must be NONLINEAR in the row id: the earlier spelling
  * u_b = (x·A1 + (b+1)·A2) mod P made every row's B uniforms an arithmetic
  * progression with the SAME step A2, so weights were strongly dependent
  * across replicates (measured corr(w_b, w_{b+1}) ≈ −0.35) and each
  * replicate's n_eff was a constant-shift permutation of the same multiset
  * — ~100× less n_eff variance than a true Poisson bootstrap, i.e. a
  * degenerate replicate distribution for any count-type statistic. Per-
  * replicate affine pairs alone don't fix the second defect: ANY map
  * affine in x is low-discrepancy over the consecutive id ranges real
  * tables have, so within-replicate threshold counts still concentrate
  * ~7× tighter than √n (measured). The fix is a quadratic congruential
  * mix per replicate — t = (a_b·x + c_b) mod P, u = (g_b·t² + t + e_b)
  * mod P — with all four parameters scrambled driver-side through
  * splitmix64 and embedded as integer literals on every side (the st6
  * constant rule). The squaring breaks the constant inter-replicate and
  * inter-row difference structure; measured over 5000 consecutive ids:
  * max |corr(w_b, w_{b+1})| ≈ 0.05 and sd(n_eff) ≈ 0.72·√n (vs the ~√n a
  * true Poisson bootstrap gives and the ~0.01·√n the affine scheme gave).
  * BootstrapSpec pins both properties.
  *
  * Three synchronized implementations (the StreamOps shared-core rule):
  * [[weightCol]] for the batch gate, [[weightSql]] for its oracle, and
  * [[weightLocal]] for the streaming twin — BootstrapSpec pins all three
  * to identical values. The Poisson inverse-CDF thresholds are computed
  * ONCE on the driver and embedded as integer literals on every side, so
  * no engine evaluates exp()/ln() at query time (the st6 constant rule).
  */
object Bootstrap {
  import StableHash.P

  /** Replicate count: B order statistics bound the CI readout; 32 gives
    * min/max ≈ the 2.5%/97.5% envelope (floor(.025·32)=0, ceil(.975·32)=32).
    */
  val B = 32

  /** splitmix64 finalizer — used ONLY driver-side to derive the per-
    * replicate parameters below; no engine evaluates it at query time.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-replicate quadratic-mix parameters (a_b, g_b in [1, P); c_b, e_b
    * in [0, P)) — 32 fixed quadruples, deterministic across runs, shared
    * verbatim by the Column expression, the SQL twin, and the local fold.
    * Overflow bound: every product is (value < P)·(value < P) < P² ≈ 1e18
    * and every addition adds < 2e9 — far under 2^63 on both engines.
    */
  case class RepParams(a: Long, c: Long, g: Long, e: Long)
  val params: IndexedSeq[RepParams] = (0 until B).map { b =>
    RepParams(
      a = Math.floorMod(mix64(4L * b), P - 1) + 1,
      c = Math.floorMod(mix64(4L * b + 1), P),
      g = Math.floorMod(mix64(4L * b + 2), P - 1) + 1,
      e = Math.floorMod(mix64(4L * b + 3), P))
  }

  /** Cumulative Poisson(1) CDF cut points scaled to [0, P): w = #{c ≤ u}.
    * P(w = k) = e⁻¹/k!; truncated at 5 (tail mass ~6e-4 folds into w=5 —
    * negligible for a mean statistic and keeps the CASE chain fixed).
    */
  val cuts: Seq[Long] = {
    val pmf = (0 to 4).map { k =>
      math.exp(-1.0) / (1 to k).foldLeft(1.0)((a, j) => a * j)
    }
    pmf.scanLeft(0.0)(_ + _).tail.map(c => (c * P).toLong)
  }

  private def pArr(f: RepParams => Long): Column =
    array(params.map(p => lit(f(p))): _*)
  private def at(arr: Column, b: Column): Column =
    element_at(arr, b.cast("int") + 1)

  /** Seeded uniform in [0, P) for (row id, replicate b in [0, B)):
    * t = (a_b·(id mod P) + c_b) mod P, then u = (g_b·t² + t + e_b) mod P.
    */
  def uniformCol(id: Column, b: Column): Column = {
    val t = ((id % P) * at(pArr(_.a), b) + at(pArr(_.c), b)) % P
    (t * t % P * at(pArr(_.g), b) + t + at(pArr(_.e), b)) % P
  }

  /** Poisson(1) weight for (row id, replicate b) — a fixed CASE chain. */
  def weightCol(id: Column, b: Column): Column = {
    val u = uniformCol(id, b)
    cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((c, k), tail) => when(u < c, k).otherwise(tail)
    }
  }

  /** DuckDB twin of [[weightCol]] — same literals, same arithmetic
    * (DuckDB list literals are 1-indexed, matching element_at).
    */
  def weightSql(id: String, b: String): String = {
    def list(f: RepParams => Long) =
      params.map(f).mkString("([", ", ", s"])[($b) + 1]")
    val t = s"((($id) % $P) * ${list(_.a)} + ${list(_.c)}) % $P"
    val u = s"(($t) * ($t) % $P * ${list(_.g)} + ($t) + ${list(_.e)}) % $P"
    val cases = cuts.zipWithIndex
      .map { case (c, k) => s"WHEN ($u) < $c THEN $k" }
      .mkString(" ")
    s"(CASE $cases ELSE ${cuts.length} END)"
  }

  /** JVM-local twin for the streaming state fold. */
  def weightLocal(id: Long, b: Int): Int = {
    val p = params(b)
    val t = ((id % P) * p.a + p.c) % P
    val u = (t * t % P * p.g + t + p.e) % P
    var k = 0
    while (k < cuts.length && u >= cuts(k)) k += 1
    k
  }
}
