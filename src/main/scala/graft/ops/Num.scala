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
  private val Wide = DecimalType(30, 6)

  /** Exact, order-independent sum of a double-valued column. */
  def dsum(c: Column): Column = sum(c.cast(Wide)).cast("double")

  /** Exact average: decimal sum / count, final division in double. */
  def davg(c: Column): Column =
    (sum(c.cast(Wide)).cast("double") / count(c)).cast("double")

  /** Oracle-side SQL for the same operations (DuckDB dialect = ANSI). */
  def sqlSum(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def sqlAvg(e: String): String =
    s"(CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE) / count($e))"
}
