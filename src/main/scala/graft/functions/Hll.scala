package graft.functions

/** The portable HyperLogLog core shared by the batch calibration query
  * (`hll1_distinct_calibration`, [[graft.queries.SketchQueries]]) and the
  * streaming twin ([[graft.streaming.StreamOps.approxDistinct]]): one
  * definition of the register/rho derivation and the estimator, so the
  * streaming state fold is PINNED to produce bit-identical registers to
  * the batch SQL — the spec asserts it, and the oracle parity of the
  * batch query then transitively covers the stream.
  *
  * All constants are interpolated into the batch query's DuckDB oracle
  * SQL from here — never re-derived — and every step up to the final
  * estimate is integer arithmetic (see SketchQueries' scaladoc for why
  * the spread must be quadratic and rho must avoid log2).
  */
object Hll {
  /** Registers: m = 256 → ±1.04/√m ≈ 6.5% standard error. */
  val M = 256
  /** rho domain width: rho ∈ [1, W+1] via a sentinel bit at 2^W. */
  val W = 20
  val SentBit: Long = 1L << W
  /** An empty register's scaled 2^-0 term (the sum is scaled by 2^(W+1)
    * so it stays integral).
    */
  val MaxTerm: Long = 1L << (W + 1)
  /** alpha_256 = 0.7213/(1 + 1.079/256) as ONE shortest-repr double
    * literal both engines parse to the same bits (the st6 rule).
    */
  val Alpha = 0.7182725932495458

  private val params = StableHash.affineParams(2)
  val RA: Long = params(0)._1
  val RB: Long = params(0)._2
  val VA: Long = params(1)._1
  val VB: Long = params(1)._2

  /** Quadratic spread of the packed hash's high residue (mod P tier). */
  def spread1(hp: Long): Long =
    (hp * hp % StableHash.P + RA * hp + RB) % StableHash.P

  /** Quadratic spread of the packed hash's low residue (mod P2 tier). */
  def spread2(hp2: Long): Long =
    (hp2 * hp2 % StableHash.P2 + VA * hp2 + VB) % StableHash.P2

  /** Register index of a packed polyHash64 value — the JVM twin of the
    * batch SQL `(hp² % P + RA·hp + RB) % P % M`.
    */
  def register(h: Long): Int = (spread1(h / 2147483648L) % M).toInt

  /** rho of a packed polyHash64 value: 1 + trailing zeros of the spread
    * low residue's bottom W bits — the JVM twin of the batch SQL
    * `length(bin(vv & -vv))` with vv = (… % 2^W) + 2^W.
    */
  def rho(h: Long): Int = {
    val v = spread2(h % 2147483648L) % SentBit | SentBit
    java.lang.Long.numberOfTrailingZeros(v) + 1
  }

  /** Column twins of [[register]]/[[rho]] for batch queries that derive
    * per-item registers outside SketchQueries' shared-SQL plumbing (the
    * graph neighborhood sketch gr7): same arithmetic, evaluated by Spark,
    * with the oracle re-deriving it from these constants.
    */
  def regCol(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftright}
    val hp = shiftright(h, 31)
    (hp * hp % StableHash.P + lit(RA) * hp + lit(RB)) % StableHash.P % M
  }

  def rhoCol(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{bin, length, lit}
    val hp2 = h % 2147483648L
    val vv = (hp2 * hp2 % StableHash.P2 + lit(VA) * hp2 + lit(VB)) %
      StableHash.P2 % SentBit + SentBit
    length(bin(vv.bitwiseAND(-vv)))
  }

  /** Estimate from a max-rho register array (0 = empty): raw harmonic
    * estimate, switched to linear counting in the small-range regime —
    * the same literals and operation ASSOCIATION as the batch query, so
    * a register-identical state yields a bit-identical estimate.
    * Returns (estimate, used, zeros).
    */
  def estimate(regs: Array[Byte]): (Double, Long, Long) = {
    var s = 0L
    var used = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) > 0) used += 1
      s += MaxTerm >> regs(i) // rho = 0 (empty) contributes MaxTerm
      i += 1
    }
    val zeros = M - used
    val raw = Alpha * (M.toLong * M).toDouble * MaxTerm.toDouble / s.toDouble
    val est =
      if (zeros > 0 && raw <= 2.5 * M)
        M.toDouble * (math.log(M.toDouble) - math.log(zeros.toDouble))
      else raw
    (est, used, zeros)
  }
}
