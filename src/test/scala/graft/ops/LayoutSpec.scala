package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("partitioned write + equality predicate = partition pruning") {
    val path = tmpDir()
    val df = (1 to 3000).map(i =>
      (i.toLong, Seq("en", "de", "fr")(i % 3), i * 1.0)).toDF("id", "lang", "v")
    Layout.writePartitioned(df, path, "lang")
    val q = Layout.read(spark, path).filter(col("lang") === "de")
    val n = q.count()
    assert(n == 1000)
    val scan = q.queryExecution.executedPlan.toString
    // the predicate must surface as a PartitionFilter (pruned at listing
    // time), not a post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in:\n$scan")
    // and only the one matching directory's file is read
    val files = q.select(input_file_name()).distinct().count()
    assert(files == 1, s"expected exactly 1 file read, got $files")
  }

  test("within-partition sort yields row-group min/max skipping stats") {
    val path = tmpDir()
    // two row groups per file (small block size forced via many rows)
    val df = (1 to 50000).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i.toLong)).toDF("id", "part", "k")
    Layout.writeSortedWithin(df, path, "part", "k")
    // a tight range on the sort key: correctness first
    val q = Layout.read(spark, path)
      .filter(col("part") === "a" && col("k") >= 100L && col("k") <= 200L)
    val rows = q.select("k").as[Long].collect()
    assert(rows.length == 51 && rows.forall(k => k >= 100 && k <= 200))
    // the range predicate reaches the scan as pushed parquet filters
    // (min/max row-group skipping happens inside the reader)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.contains("GreaterThanOrEqual(k,100)"),
      s"expected pushed range filters in:\n$scan")
  }
}
