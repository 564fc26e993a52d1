package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- Z-order (multi-dimension data skipping) ---------------------------

  /** Quantize a numeric column into [0, 2^bits) against fixed bounds
    * (caller supplies the domain — schema knowledge, not a data scan).
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"quantize needs hi > lo, got [$lo, $hi]")
    val n = (1L << bits) - 1
    least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble)),
      lit(0L)), lit(n))
  }

  /** Bit-interleaved Z-value of two quantized (long, non-negative)
    * columns: bit i of x lands at 2i, bit i of y at 2i+1. Pure column
    * expression (2·bits shift/mask terms, whole-stage codegen'd).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ORDERED write: rows sorted along the Z-curve over two dimensions,
    * so parquet row-group min/max stats skip on range predicates on
    * EITHER column — the single-key sort ([[writeSortedWithin]]) skips
    * only on its one key. This is the lakehouse "OPTIMIZE ZORDER BY"
    * layout, as a plain write: range-partition by z (so files cover
    * disjoint curve segments — `parts` files for the dataset), sort
    * within, drop the scratch key. LayoutSpec measures the effect: scan
    * `numOutputRows` on a 2-D box query vs the same data sorted by an
    * unrelated key.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    xRange: (Double, Double), yRange: (Double, Double),
                    bits: Int = 12, parts: Int = 8): Unit = {
    val z = zValue(
      quantize(col(xCol), xRange._1, xRange._2, bits),
      quantize(col(yCol), yRange._1, yRange._2, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the table-maintenance op every streaming or
    * incremental sink eventually needs (each micro-batch/task writes a
    * file; a year of 1-minute batches is half a million files, and at
    * 100 TB the driver-side listing + per-file open cost dominates scans
    * long before data volume does).
    *
    * Sizing is measured, not guessed: target file count = ceil(actual
    * on-disk bytes / targetBytes), from the filesystem listing of the
    * source dir. The rewrite is a plain scan → repartition(n) → write
    * (one wide exchange, no sort — compaction must not pay a layout cost
    * it wasn't asked for; compose with [[writeSortedWithin]]/
    * [[writeZOrdered]] when clustering is wanted). Writes to a fresh dir
    * then swaps nothing: the SAFE discipline on object stores is
    * write-new + repoint readers, never in-place overwrite of a dir being
    * read — in-place overwrite of `src` is possible only via an
    * intermediate materialization and is deliberately not offered here.
    */
  def compact(spark: SparkSession, src: String, dest: String,
              targetBytes: Long): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = parquetBytes(new java.io.File(src))
    val files = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
    spark.read.parquet(src)
      .repartition(files.toInt)
      .write.mode("overwrite").parquet(dest)
    files
  }

  private def parquetBytes(f: java.io.File): Long =
    if (f.isDirectory) f.listFiles.map(parquetBytes).sum
    else if (f.getName.endsWith(".parquet")) f.length
    else 0L
}
