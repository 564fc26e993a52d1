package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.domain.{Bulk, Fixtures}

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("S1: bulk JSON round-trips through the schema'd reader") {
    val dir = Files.createTempDirectory("bulks").toString + "/bulks"
    spark.createDataset(Fixtures.bulks).write.json(dir)
    val back = Sources.readBulksJson(spark, dir).collect().sortBy(_.bulk_id)
    assert(back.toSeq == Fixtures.bulks.sortBy(_.bulk_id))
  }

  test("S5: array melt preserves positional id↔energy pairing") {
    val df = Seq(
      ("id", Seq(7L, 8L, 9L), Seq(0.1, 0.2, 0.3)),
      ("ood", Seq(1L), Seq(9.9))).toDF("distribution", "ids", "energies")
    val out = Sources.meltArrays(df, "distribution", "ids", "energies")
      .orderBy("distribution", "id")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("id", 7L, 0.1), ("id", 8L, 0.2), ("id", 9L, 0.3),
      ("ood", 1L, 9.9)))
  }

  test("S5: Npz parses a REAL numpy-written .npz (stored and compressed)") {
    def load(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      try in.readAllBytes() finally in.close()
    }
    val arrays = Npz.readNpz(load("parity.npz"))
    assert(arrays.keySet == Set("ids", "energies", "counts", "f32"))
    assert(arrays("ids") == Npz.NpStrings(Seq(4),
      Array("mp-101", "mp-2", "mp-33333", "mvc-7")) ||
      arrays("ids").asInstanceOf[Npz.NpStrings].data.toSeq ==
        Seq("mp-101", "mp-2", "mp-33333", "mvc-7"))
    assert(arrays("energies").asInstanceOf[Npz.NpDoubles].data.toSeq ==
      Seq(1.5, -2.25, 0.75, -0.125))
    assert(arrays("counts").asInstanceOf[Npz.NpLongs].data.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    assert(arrays("f32").asInstanceOf[Npz.NpDoubles].data.toSeq == Seq(0.5, 1.5))
    // deflated members parse identically
    val compressed = Npz.readNpz(load("parity_compressed.npz"))
    assert(compressed("energies").asInstanceOf[Npz.NpDoubles].data.toSeq ==
      Seq(1.5, -2.25, 0.75, -0.125))
  }

  test("S5: distributed .npz read melts id/energy pairs") {
    val dir = Files.createTempDirectory("npz")
    def cp(name: String): Unit = {
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      try Files.write(dir.resolve(name), in.readAllBytes()) finally in.close()
    }
    cp("parity.npz"); cp("parity_compressed.npz")
    val out = Sources.readNpzParity(spark, dir.toString)
      .orderBy("distribution", "id")
      .as[(String, String, Double)].collect().toSeq
    assert(out.size == 8) // 4 pairs per archive
    assert(out.count(_._2 == "mp-33333") == 2)
    assert(out.filter(_._2 == "mp-2").forall(_._3 == -2.25))
  }

  test("S5: truncated/overrunning NPY members fail cleanly (no buffer errors)") {
    def npy(descr: String, shape: String, payload: Array[Byte]): Array[Byte] = {
      val header = s"{'descr': '$descr', 'fortran_order': False, 'shape': ($shape), }\n"
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x93); out.write("NUMPY".getBytes("US-ASCII"))
      out.write(1); out.write(0)
      out.write(header.length & 0xff); out.write((header.length >> 8) & 0xff)
      out.write(header.getBytes("ISO-8859-1")); out.write(payload)
      out.toByteArray
    }
    // payload holds 2 doubles, shape says 3 → hard error naming the deficit
    val short = intercept[IllegalArgumentException](
      Npz.readNpy(npy("<f8", "3,", Array.fill(16)(0: Byte))))
    assert(short.getMessage.contains("need 24"))
    // well-formed control: same builder, honest shape
    Npz.readNpy(npy("<f8", "2,", Array.fill(16)(0: Byte))) match {
      case Npz.NpDoubles(Seq(2), d) => assert(d.toSeq == Seq(0.0, 0.0))
      case other => fail(s"$other")
    }
    // v2 header with a truncated length field
    val v2 = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 2, 0, 1, 0)
    intercept[IllegalArgumentException](Npz.readNpy(v2))
    // v1 header length overrunning the buffer
    intercept[IllegalArgumentException](
      Npz.readNpy(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0, 0x40, 0)))
  }

  test("S6: binaryFile trajectory source parses each file deterministically") {
    val dir = Files.createTempDirectory("trajs")
    Files.write(dir.resolve("a.traj"), "frame1 frame2".getBytes)
    Files.write(dir.resolve("b.traj"), "other content".getBytes)
    Files.write(dir.resolve("ignore.txt"), "not a traj".getBytes)
    val out = Sources.readTrajectories(spark, dir.toString, Sources.FakeTrajParser).collect()
    assert(out.length == 2)
    assert(out.forall(_.energies.nonEmpty))
    val again = Sources.readTrajectories(spark, dir.toString, Sources.FakeTrajParser).collect()
    assert(out.map(_.energies.sum).sorted.sameElements(again.map(_.energies.sum).sorted))
  }

  test("S7: kv lookup is a broadcast left join with null misses") {
    val base = Seq(("mp-1", 10), ("mp-2", 20), ("mp-3", 30)).toDF("bulk_id", "x")
    val kv = Seq(("mp-1", true), ("mp-3", false)).toDF("bulk_id", "stable")
    val out = Sources.kvLookup(base, kv, "bulk_id")
    assert(out.count() == 3)
    assert(out.filter(col("stable").isNull).select("bulk_id").as[String].head() == "mp-2")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("partitioned parquet sink enables partition pruning (SURVEY §4.1)") {
    val dir = Files.createTempDirectory("part").toString + "/docs"
    Seq((1L, "x", "en"), (2L, "y", "de"), (3L, "z", "en"))
      .toDF("doc_id", "text", "lang")
      .write.partitionBy("lang").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in:\n$plan")
  }

  test("S11: provenance sink writes the resolved config") {
    val dir = Files.createTempDirectory("out").toString
    Sources.writeProvenance(spark, dir, """{"a":1}""")
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/run_config.json")) == """{"a":1}""")
  }
}
