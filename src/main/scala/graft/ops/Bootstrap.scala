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

  // Affine mixing constants (Knuth multiplicative / Fermat-prime products),
  // reduced mod P so every intermediate stays under 2^63:
  // (id % P) · A1 < 1e18, + (b+1) · A2 < 3.4e10 — no overflow anywhere.
  private val A1: Long = 2654435761L % P
  private val A2: Long = (40503L * 65537L) % P

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

  /** Seeded uniform in [0, P) for (row id, replicate b). */
  def uniformCol(id: Column, b: Column): Column =
    ((id % P) * lit(A1) + (b + 1) * lit(A2)) % P

  /** Poisson(1) weight for (row id, replicate b) — a fixed CASE chain. */
  def weightCol(id: Column, b: Column): Column = {
    val u = uniformCol(id, b)
    cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((c, k), tail) => when(u < c, k).otherwise(tail)
    }
  }

  /** DuckDB twin of [[weightCol]] — same literals, same arithmetic. */
  def weightSql(id: String, b: String): String = {
    val u = s"((($id) % $P) * $A1 + (($b) + 1) * $A2) % $P"
    val cases = cuts.zipWithIndex
      .map { case (c, k) => s"WHEN ($u) < $c THEN $k" }
      .mkString(" ")
    s"(CASE $cases ELSE ${cuts.length} END)"
  }

  /** JVM-local twin for the streaming state fold. */
  def weightLocal(id: Long, b: Int): Int = {
    val u = ((id % P) * A1 + (b + 1).toLong * A2) % P
    var k = 0
    while (k < cuts.length && u >= cuts(k)) k += 1
    k
  }
}
