package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit (the Deequ/"expectations" shape): declarative
  * constraints compiled into ONE aggregate pass over the table — at
  * 100 TB the audit costs one scan regardless of how many constraints it
  * carries, where naive per-check queries cost a scan each.
  *
  * Each constraint contributes a violation-count aggregate; the single
  * result row is unpivoted to (check, violations, n_rows) with `stack`.
  * Uniqueness counts rows beyond their key's first occurrence
  * (count − countDistinct), so a fully-duplicated pair counts 1.
  */
object DataQuality {

  sealed trait Check { def name: String; def violations: Column }
  /** null (or, for strings, empty) values */
  case class NotNull(col: String) extends Check {
    val name = s"not_null_$col"
    def violations: Column = count(when(expr(col).isNull, 1))
  }
  /** duplicate key occurrences beyond the first */
  case class Unique(col: String) extends Check {
    val name = s"unique_$col"
    def violations: Column = count(expr(col)) - countDistinct(expr(col))
  }
  /** values outside [lo, hi] (nulls don't violate range — add NotNull) */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"range_$col"
    def violations: Column =
      count(when(expr(col) < lo || expr(col) > hi, 1))
  }
  /** non-null values not fully matching the (RE2-safe) pattern */
  case class Matches(col: String, re: String) extends Check {
    val name = s"matches_$col"
    def violations: Column =
      count(when(expr(col).isNotNull && !expr(col).rlike(s"^(?:$re)$$"), 1))
  }

  /** Row-level violation predicate for checks decidable per row (Unique
    * is aggregate-scoped — route duplicates with keep-first dedup, not
    * here). Null range inputs don't violate, matching `audit`'s counts.
    */
  def rowViolation(c: Check): Column = c match {
    case NotNull(colName) => expr(colName).isNull
    case InRange(colName, lo, hi) =>
      coalesce(expr(colName) < lo || expr(colName) > hi, lit(false))
    case Matches(colName, re) =>
      expr(colName).isNotNull && !expr(colName).rlike(s"^(?:$re)$$")
    case u: Unique => throw new IllegalArgumentException(
      s"${u.name}: uniqueness is not row-decidable; use keep-first dedup")
  }

  /** The APPLY side of the audit (dead-letter routing): tag every row
    * with the checks it fails — CSV in declaration order, '' = clean
    * (concat_ws skips the null branches identically in Spark and ANSI
    * SQL). One narrow projection, ZERO exchanges however many rules ride
    * the scan; split downstream with `filter(failed_checks =!= "")` —
    * the quarantine/dead-letter pattern every ingest pipeline needs.
    */
  def quarantineTag(df: DataFrame, checks: Seq[Check]): DataFrame =
    df.withColumn("failed_checks", concat_ws(",",
      checks.map(c => when(rowViolation(c), lit(c.name))): _*))

  /** One row per check: (check, violations, n_rows). Single scan, single
    * (1-row) aggregate; `stack` unpivots on the driver-free result.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = count(lit(1)).as("__n") +:
      checks.map(c => c.violations.cast("long").as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map(c => s"'${c.name}', ${c.name}").mkString(", ")
    row.select(expr(
        s"stack(${checks.size}, $stackArgs) AS (check, violations)"),
      col("__n").as("n_rows"))
  }
}
