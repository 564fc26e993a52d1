package graft.sources

import org.apache.spark.sql.DataFrame

/** D-block co-location (SURVEY §2.11 / builder prompt "co-locate joins via
  * bucketing"): persist both sides of a hot join bucketed AND sorted by the
  * join key. Spark's bucketed scan then reports the hash-partitioning and
  * sort order as already satisfied, so the join plans as SortMergeJoin with
  * ZERO exchanges and ZERO sorts — the shuffle is paid once at write time
  * and amortized over every subsequent join/aggregation on that key.
  *
  * This is the 100 TB lever for repeatedly-joined fact tables (the
  * reference's per-bulk partition discipline, dask_utils.py repartition
  * chains): at 1000 executors a bucketed join is the difference between a
  * full-network shuffle of the big side per query and none.
  * BucketingSpec pins the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. Bucket count
    * is a layout decision: pick so one bucket ≈ one task's worth of data
    * at the target scale (buckets = totalBytes / ~256 MB), and use the
    * SAME count on both sides of the intended join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    // repartition on the bucket key first (same Murmur3 hash as the bucket
    // assignment) → exactly ONE file per bucket. With multiple files per
    // bucket Spark cannot trust per-bucket sortedness and re-inserts a Sort
    // above the scan, forfeiting half the layout's value.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
