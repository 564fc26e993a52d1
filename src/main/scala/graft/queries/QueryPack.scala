package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of driver-checkable queries.
  *
  * Each entry pairs a Spark implementation with (where SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Contract (builder prompt +
  * repo Verify.scala): column names must match the oracle exactly, results
  * must be deterministic (unique sort keys; no raw-double accumulation —
  * see [[graft.ops.Num]]), and every aggregate is aliased identically on
  * both sides.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
