package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B of gr7's register propagation spellings at r12:
  * sparse (id, reg, rho) rows (the r11 shape) vs packed M-byte binaries
  * ([[graft.functions.HllRegs]]), plus a piecewise breakdown of the
  * packed form (round 1 checkpoint / round 2 / full query) so a
  * regression can be attributed to a stage instead of a median.
  * Usage: ProfileGr7Pack <sfDir> [reps].
  */
object ProfileGr7Pack {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val gb = graft.queries.GraphQueries.graphBase(spark, sfDir)
    val e = gb.eSev
    val nodes = gb.nodesSev
    println(s"[profile] edges: ${e.count()}, nodes: ${nodes.count()}")

    import graft.functions.{Hll, HllRegs, StableHash}
    val h = StableHash.polyHash64(concat(lit("n"), col("id").cast("string")))

    def sparse2(): DataFrame = {
      val r0 = nodes.select(col("id"),
        Hll.regCol(h).as("reg"), Hll.rhoCol(h).as("rho"))
      def prop(r: DataFrame): DataFrame =
        r.unionAll(
            e.join(r.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
              .select(col("src").as("id"), col("reg"), col("rho")))
          .groupBy("id", "reg").agg(max(col("rho")).as("rho"))
      prop(prop(r0))
    }

    def packedR1(): DataFrame = {
      val r0 = nodes.select(col("id"),
        Hll.regCol(h).as("reg"), Hll.rhoCol(h).cast("int").as("rho"))
      r0.unionAll(
          e.join(r0.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
            .select(col("src").as("id"), col("reg"), col("rho")))
        .groupBy("id")
        .agg(HllRegs.initRegs(col("reg"), col("rho")).as("regs"))
    }

    def packed2(): DataFrame = {
      val r1 = packedR1().localCheckpoint()
      r1.unionAll(
          e.join(r1.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
            .select(col("src").as("id"), col("regs")))
        .groupBy("id").agg(HllRegs.maxRegs(col("regs")).as("regs"))
    }

    def time(label: String)(build: => DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to reps) {
      time(s"rep$r sparse 2 rounds")(sparse2())
      time(s"rep$r packed round1  ")(packedR1())
      time(s"rep$r packed 2 rounds")(packed2())
      time(s"rep$r full gr7 query ") {
        graft.SparkEntry.queries("gr7_hyperball")(spark, sfDir)
      }
    }
    spark.stop()
  }
}
