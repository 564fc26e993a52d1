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

  /** `parts` = files per partition VALUE, not total output partitions:
    * the old `repartition(parts, col)` with the parts=1 default hashed
    * every row of every value into ONE task — the whole dataset written
    * serially. One hash partition per value keeps writes parallel across
    * values (each value still yields exactly `parts` files); parts>1 adds
    * a row-hash salt to split a hot value across tasks.
    */
  private def clustered(df: DataFrame, partCol: String, parts: Int): DataFrame =
    if (parts <= 1) df.repartition(col(partCol))
    else df.repartition(col(partCol),
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(parts)))

  /** Hive-style partitioned parquet write. */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
                       parts: Int = 1): Unit =
    clustered(df, partCol, parts)
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Partitioned write with a within-file sort on `sortCol` for row-group
    * min/max skipping on range predicates.
    */
  def writeSortedWithin(df: DataFrame, path: String, partCol: String,
                        sortCol: String, parts: Int = 1): Unit =
    clustered(df, partCol, parts)
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
