package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable content hashing (SURVEY §7.4 hard-part #2:
  * U10/U11 cache keys must be canonical and stable across runtimes).
  *
  * Two tiers:
  *  - [[polyHash]]: a 31-ary polynomial rolling hash mod 2^31-ish prime,
  *    expressible identically in Spark and DuckDB SQL — used wherever an
  *    oracle must reproduce the value (minhash, simhash, fingerprints,
  *    surrogate model energies).
  *  - `xxhash64(...)` (Spark built-in, codegen'd): the scale path for
  *    engine-internal keys (memo-cache, salting) where no external engine
  *    needs to reproduce the value — ~10× faster than the char fold.
  *
  * Reference: content-addressed memo keys, catlas/cache_utils.py:49-99 and
  * joblib hashes at prediction_steps.py:305-331.
  */
object StableHash {
  val P: Long = 1000000007L

  /** Second, independent prime for the wide fingerprint tier. */
  val P2: Long = 998244353L

  /** h(s) = fold over chars: (h*31 + codepoint) mod P — evaluated by the
    * codegen'd [[PolyHashExpr]] (identical values to the portable fold
    * below; ~20× faster than the interpreted higher-order version).
    */
  def polyHash(s: Column): Column = Exprs.polyHash(s)

  /** The same fold via built-in higher-order functions — kept as the
    * reference implementation the custom expression is tested against.
    */
  def polyHashHof(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (acc, c) => (acc * 31 + ascii(c)) % P)

  /** DuckDB twin of [[polyHash]] — same fold, same constants. */
  def polyHashSql(e: String): String = polyFoldSql(e, P)

  private def polyFoldSql(e: String, m: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $m)"

  /** Wide (~60-bit) content fingerprint for dedup tiers whose semantic
    * quality depends on collision rate at corpus scale (span dedup: a
    * cross-doc hash collision MARKS TEXT AS DUPLICATE, so the ~2^30 range
    * of [[polyHash]] starts manufacturing false dup spans around ~50k
    * distinct grams — birthday bound — far below one shard of a 100-TB
    * corpus). Two independent folds mod P and mod P2 paired into one
    * BIGINT: `h_P(s)·2^31 + h_P2(s)` (< 2^61, no overflow). A collision
    * requires the difference polynomial at base 31 to vanish mod BOTH
    * primes, i.e. mod P·P2 ≈ 2^60 — the birthday bound moves to ~10^9
    * distinct grams. Expressible identically in DuckDB (all arithmetic
    * stays under 2^63), so oracle parity is preserved — evaluated by the
    * codegen'd [[PolyHash64Expr]] (one char loop, two accumulators).
    */
  def polyHash64(s: Column): Column = Exprs.polyHash64(s)

  /** JVM-local twin of [[polyHash64]] for typed/streaming code paths
    * (the HLL streaming twin's state fold must hash identically to the
    * batch expression — same loop as [[PolyHash64Expr.nullSafeEval]]).
    */
  def polyHash64Local(s: String): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < s.length) {
      h1 = (h1 * 31 + s.charAt(i)) % P
      h2 = (h2 * 31 + s.charAt(i)) % P2
      i += 1
    }
    h1 * 2147483648L + h2
  }

  /** The same pairing via built-in folds — the reference implementation
    * [[PolyHash64Expr]] is tested against.
    */
  def polyHash64Hof(s: Column): Column =
    polyHashHof(s) * lit(2147483648L) +
      aggregate(split(s, ""), lit(0L), (acc, c) => (acc * 31 + ascii(c)) % P2)

  /** DuckDB twin of [[polyHash64]] — same two folds, same pairing. */
  def polyHash64Sql(e: String): String =
    s"(${polyFoldSql(e, P)} * 2147483648 + ${polyFoldSql(e, P2)})"

  /** Affine re-hash family h_i(x) = (a_i·x + b_i) mod P for minhash; fixed
    * deterministic parameters (Knuth multiplicative constants), identical
    * in the generated oracle SQL because both sides read these vals.
    */
  def affineParams(n: Int): Seq[(Long, Long)] =
    (1 to n).map { i =>
      val a = (i.toLong * 2654435761L) % P
      val b = (i.toLong * 40503L * 65537L) % P
      (if (a == 0) 1L else a, b)
    }

  /** Fold a signature slice into one band key: ((k·31 + s₀)·31 + s₁)… mod P. */
  def bandKey(sigs: Seq[Column]): Column =
    sigs.foldLeft(lit(0L): Column)((acc, s) => (acc * 31 + s) % P)

  def bandKeySql(sigs: Seq[String]): String =
    sigs.foldLeft("CAST(0 AS BIGINT)")((acc, s) => s"(($acc) * 31 + ($s)) % $P")
}
