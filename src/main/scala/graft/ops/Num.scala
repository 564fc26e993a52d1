package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric discipline for oracle-exact aggregation.
  *
  * A double `sum()` is order-dependent (FP addition is non-associative), so
  * the same query summed over different partitionings — or by DuckDB vs
  * Spark — can differ in the last ulp and fail a hash compare. The fix:
  * per-row values stay in double (a fixed expression tree evaluates
  * identically under IEEE 754 in any engine), but *commutative accumulation*
  * is done in exact decimal, then cast back to double.
  *
  * This mirrors how a 1000-executor aggregation must behave: partial
  * (map-side) aggregation in any order yields bit-identical results, so the
  * plan stays a cheap partial+final HashAggregate with no ordering constraint.
  */
object Num {
  // 18 digits: the widest precision both engines back with a 64-bit long
  // (Spark Decimal compact path, DuckDB int64) — the per-row cast and the
  // partial-sum hot loop stay off BigDecimal/int128. Capacity: per-row
  // |value| < 1e12 (corpus max ~1e5, squared terms ~1e10); the SUM result
  // type widens to DECIMAL(28,6) automatically, so accumulation never
  // overflows before ~1e22.
  private val Wide = DecimalType(18, 6)

  // CAVEAT (learned the hard way): per-row values whose SHORTEST decimal
  // representation terminates at digit 7+ with a trailing 5 (e.g.
  // price_2dp / 1e5 = 0.0101375) sit on an exact rounding tie at scale 6 —
  // Spark's HALF_UP and DuckDB's tie-breaking disagree. Values with ≤6
  // decimal digits, or full-width "messy" doubles (products of inexact
  // factors), round unambiguously and match. Keep derived columns in one
  // of those two regimes.

  /** Exact, order-independent sum of a double-valued column. */
  def dsum(c: Column): Column = sum(c.cast(Wide)).cast("double")

  /** Exact average: decimal sum / count, final division in double. */
  def davg(c: Column): Column =
    (sum(c.cast(Wide)).cast("double") / count(c)).cast("double")

  /** Oracle-side SQL for the same operations (DuckDB dialect = ANSI). */
  def sqlSum(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlAvg(e: String): String =
    s"(CAST(sum(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE) / count($e))"
}
