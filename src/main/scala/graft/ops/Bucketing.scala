package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (SURVEY §4 join-strategy table; the brief's
  * "bucketing for co-located joins").
  *
  * Writing both fact tables bucketed by the join key lets a later
  * equi-join read both sides already hash-partitioned — the join plans as
  * a zipped SortMergeJoin with ZERO Exchange. At 100 TB this converts the
  * biggest recurring shuffle (fact⋈fact on the same key every run) into a
  * scan-local join; the bucket count is chosen once at write time to match
  * target parallelism.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    // repartition on the bucket key first (same Murmur3 hash as the bucket
    // assignment) → exactly ONE file per bucket. With multiple files per
    // bucket Spark cannot trust per-bucket sortedness and re-inserts a
    // Sort above the scan (with spark.sql.legacy.bucketedTableScan
    // .outputOrdering=true and single-file buckets, the join is both
    // exchange-free AND sort-free — BucketingSpec pins both).
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bucketed write with a secondary in-bucket sort order — the layout an
    * operator with a compound ordering requirement (as-of join: sorted by
    * (key, time)) reads back exchange-free AND sort-free.
    */
  def writeBucketedSorted(df: DataFrame, table: String, key: String,
                          sortCols: Seq[String], buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
