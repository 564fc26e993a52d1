package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data layout for scan pruning — the storage half of 100 TB performance.
  * The corpus tables are single unpartitioned files (fine for a gate), but
  * a production lake keys its layout to its predicates:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning on a
  *    low-cardinality column; an equality/IN predicate on it becomes a
  *    PartitionFilter — pruned directories are never listed, let alone
  *    read ("partition pruning", visible in `.explain` as
  *    `PartitionFilters: [...]`).
  *  - [[writeSortedWithin]]: within each partition, sort files by a
  *    second, high-cardinality key; parquet row-group min/max stats then
  *    skip most row groups for range predicates on that key ("data
  *    skipping"). Sorting is per output file (`sortWithinPartitions`
  *    after `repartition` on the partition column) — a local sort, never
  *    a global one.
  *
  * Together: predicate on (partition key, sort key) touches one directory
  * and few row groups of it. LayoutSpec pins the PartitionFilters plan and
  * the pruned file count.
  */
object Layout {

  /** Hive-style partitioned parquet write. `parts` bounds the files per
    * partition value (small dims → 1).
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
                       parts: Int = 1): Unit =
    df.repartition(parts, col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Partitioned write with a within-file sort on `sortCol` for row-group
    * min/max skipping on range predicates.
    */
  def writeSortedWithin(df: DataFrame, path: String, partCol: String,
                        sortCol: String, parts: Int = 1): Unit =
    df.repartition(parts, col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
