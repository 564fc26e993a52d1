package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated corpus (TESTDATA.md).
  *
  * Every operator query receives `(spark, sfDir)` and reads one or more of
  * these tables. Parquet scans are distributed and columnar; Catalyst prunes
  * columns + pushes predicates into the scan, so loaders stay unprojected
  * here and each query selects only what it needs (visible as ReadSchema /
  * PushedFilters in `.explain`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` normalized to a canonical nanos-since-epoch BIGINT.
    *
    * The corpus has shipped `ts` both as TIMESTAMP(NANOS) — which the
    * sessions read as BIGINT nanos via `nanosAsLong` — and as plain
    * micros TIMESTAMP/TIMESTAMP_NTZ. All downstream window math is
    * integer arithmetic on nanos, so whatever the physical type, convert
    * here (micros → nanos is exact ×1000; the cast to TIMESTAMP under the
    * UTC session zone makes NTZ and TZ agree — the zone is pinned by
    * [[Sessions.builder]], shared by every entry point). Narrow and
    * codegen'd; no behavior change when the file is already nanos-BIGINT.
    *
    * Known perf trade-off on MICROS corpora only: the withColumn rewrite
    * sits between the scan and any ts predicate, so ts filters stop
    * reaching the parquet scan as PushedFilters (row-group pruning on ts
    * is lost; other columns' pushdown is unaffected). The nanos-BIGINT
    * corpus — the shipping default — takes the LongType branch and keeps
    * full pushdown. If a micros corpus with selective ts filters shows up,
    * filter on the RAW column before converting in that query.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.LongType
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
