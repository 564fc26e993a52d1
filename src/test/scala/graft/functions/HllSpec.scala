package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the three twin derivations of the portable HLL core to each other:
  * the JVM fold ([[Hll.register]]/[[Hll.rho]], used by the streaming
  * state op), the Column expressions ([[Hll.regCol]]/[[Hll.rhoCol]], used
  * by gr7's register propagation), and — transitively through the
  * hash-green hll1/hll2 gates — the SQL the DuckDB oracle evaluates. A
  * drift in any one would silently decalibrate a tier while the others
  * stay green.
  */
class HllSpec extends SparkTestBase {

  test("regCol/rhoCol match the JVM register/rho on real packed hashes") {
    import spark.implicits._
    // the same id shapes the queries hash: short prefixed user/node ids
    val ids = (0 until 2000).map(i => "n" + i) ++
      (0 until 500).map(i => "u" + i)
    val hashes = ids.map(StableHash.polyHash64Local)
    val got = hashes.toDF("h")
      .select(col("h"), Hll.regCol(col("h")).as("reg"),
        Hll.rhoCol(col("h")).as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getInt(2)))
    got.foreach { case (h, reg, rho) =>
      assert(reg == Hll.register(h), s"register drift at h=$h")
      assert(rho == Hll.rho(h), s"rho drift at h=$h")
    }
  }

  test("rho is geometric over [1, W+1] and registers fill binomially") {
    val hs = (0 until 100000).map(i => StableHash.polyHash64Local("u" + i))
    val rhos = hs.map(Hll.rho)
    // 100k geometric draws: min is 1 a.s.; the max lands near log2(100k)
    // ≈ 17 (rho = W+1 = 21 has probability 2^-20 — NOT expected here);
    // the sentinel caps it at W+1
    assert(rhos.min == 1 && rhos.max >= 14 && rhos.max <= Hll.W + 1,
      s"rho range [${rhos.min}, ${rhos.max}] inconsistent with geometric")
    // geometric halving: P(rho > k) = 2^-k within sampling noise
    val gt4 = rhos.count(_ > 4).toDouble / rhos.size
    assert(math.abs(gt4 - 0.0625) < 0.01, s"P(rho>4) = $gt4, expected ~1/16")
    // no register lattice: all 256 registers hit for 100k spread hashes
    assert(hs.map(Hll.register).distinct.size == Hll.M,
      "quadratic spread must fill every register at 100k items")
  }
}
