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

  test("z-value interleaves bits like the scalar reference") {
    def zRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 1L), (170L, 85L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      Layout.zValue(col("x"), col("y"), 8).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1), 8),
        s"z(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-ordered layout skips row groups on a 2-D box query") {
    val zPath = tmpDir(); val basePath = tmpDir()
    // 200x200 grid, one row per cell
    val df = (0 until 40000).map { i =>
      (i.toLong, (i % 200).toDouble, (i / 200).toDouble)
    }.toDF("id", "x", "y")
    Layout.writeZOrdered(df, zPath, "x", "y", (0.0, 200.0), (0.0, 200.0),
      bits = 8, parts = 16)
    // control: same rows, same file count, NO locality (hash clustering) —
    // every row group's x/y min/max spans the whole domain
    df.repartition(16, xxhash64(col("id")))
      .write.mode("overwrite").parquet(basePath)

    def boxScan(path: String): (Long, Long) = {
      val q = Layout.read(spark, path).filter(
        col("x") >= 50.0 && col("x") < 60.0 &&
          col("y") >= 50.0 && col("y") < 60.0)
      val n = q.collect().length.toLong
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      (n, scanned)
    }
    val (nZ, scannedZ) = boxScan(zPath)
    val (nB, scannedB) = boxScan(basePath)
    assert(nZ == 100 && nB == 100) // correctness on both layouts
    // the z layout must read a small fraction of what the control reads
    assert(scannedZ * 2 < scannedB,
      s"z-order skipped nothing: z=$scannedZ control=$scannedB")
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

  test("compact: many small files → measured target count, data intact") {
    val src = tmpDir(); val dest = tmpDir() + "/compacted"
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    df.repartition(40).write.mode("overwrite").parquet(src) // 40 small files
    def parquetFiles(p: String) = new java.io.File(p).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) == 40)
    val totalBytes = new java.io.File(src).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target ≈ a quarter of the data per file → expect ~4 output files
    val n = Layout.compact(spark, src, dest, targetBytes = totalBytes / 4)
    assert(parquetFiles(dest) == n && n >= 2 && n <= 8,
      s"expected ~4 compacted files, planned $n, wrote ${parquetFiles(dest)}")
    // content unchanged (same rows, nothing lost or duplicated)
    val before = df.orderBy("id").collect().toSeq
    val after = Layout.read(spark, dest).orderBy("id").collect().toSeq
    assert(after == before)
  }
}
