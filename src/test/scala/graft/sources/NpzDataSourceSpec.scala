package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

class NpzDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def fixtureDir(): String =
    NpzFixtures.writeTo(Files.createTempDirectory("npzds"))

  test("format(npz): schema inferred from the first archive; one row per " +
    "archive; missing member reads as null") {
    val df = spark.read.format("npz").load(fixtureDir())
    assert(df.schema == StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("counts", ArrayType(LongType, containsNull = false)),
      StructField("energies", ArrayType(DoubleType, containsNull = false)),
      StructField("ids", ArrayType(StringType, containsNull = false)))))
    val rows = df
      .select(regexp_extract(col("path"), "([^/]+)\\.npz", 1).as("f"),
        col("counts"), col("energies"), col("ids"))
      .orderBy("f")
      .as[(String, Option[Seq[Long]], Seq[Double], Seq[String])]
      .collect().toSeq
    assert(rows == Seq(
      ("val_id", Some(Seq(1L, 2L, 3L, 4L)), Seq(1.5, -2.25, 0.75, -0.125),
        Seq("mp-101", "mp-2", "mp-33333", "mvc-7")),
      ("val_ood", None, Seq(0.5, -1.75), Seq("mp-8", "oqmd-77"))))
  }

  test("format(npz): column pruning reaches the scan (readSchema shrinks " +
    "to the projected members)") {
    val df = spark.read.format("npz").load(fixtureDir()).select("energies")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSeq == Seq("energies"), scans.head.sql)
    assert(df.as[Seq[Double]].collect().map(_.sum).sorted.toSeq ==
      Seq(-1.25, -0.125).sorted)
  }

  test("Npz.readNpz keep-gate skips unrequested members") {
    val arrays = Npz.readNpz(NpzFixtures.inDist, Set("energies"))
    assert(arrays.keySet == Set("energies"))
  }

  test("npz fixtures round-trip through the reference parser (writer " +
    "conformance: v1 header, 64-byte alignment, UTF-32LE strings)") {
    val arrays = Npz.readNpz(NpzFixtures.inDist)
    assert(arrays("ids").asInstanceOf[Npz.NpStrings].data.toSeq ==
      Seq("mp-101", "mp-2", "mp-33333", "mvc-7"))
    assert(arrays("energies").asInstanceOf[Npz.NpDoubles].data.toSeq ==
      Seq(1.5, -2.25, 0.75, -0.125))
    assert(arrays("counts").asInstanceOf[Npz.NpLongs].data.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("format(npz): melt composes on top for join-ready rows") {
    val raw = spark.read.format("npz").load(fixtureDir())
      .withColumn("dist", regexp_extract(col("path"), "([^/]+)\\.npz", 1))
    val out = Sources.meltArrays(raw, "dist", "ids", "energies")
      .orderBy("distribution", "id")
      .as[(String, String, Double)].collect().toSeq
    assert(out.size == 6 && out.head == ("val_id", "mp-101", 1.5))
  }
}
