package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isolated A/B of gr7's two-round register propagation: fully LAZY
  * unroll (round-1 subtree referenced twice by round 2 — ReuseExchange
  * dedupes the shuffle writes but the reduce-side aggregate and the edge
  * join above it recompute per reference) vs round-1 MATERIALIZED behind
  * an eager localCheckpoint. Interleaved reps on the real graph so
  * JIT/cache state can't favor one arm. Usage: ProfileGr7Prop <sfDir> [reps].
  */
object ProfileGr7Prop {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val gb = graft.queries.GraphQueries.graphBase(spark, sfDir)
    val e = gb.e
    println(s"[profile] edges: ${e.count()}, nodes: ${gb.nodes.count()}")

    import graft.functions.{Hll, StableHash}
    val h = StableHash.polyHash64(concat(lit("n"), col("id").cast("string")))
    val r0 = gb.nodes.select(col("id"),
      Hll.regCol(h).as("reg"), Hll.rhoCol(h).as("rho"))
    def propagate(r: DataFrame): DataFrame =
      r.unionAll(
          e.join(r.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
            .select(col("src").as("id"), col("reg"), col("rho")))
        .groupBy("id", "reg").agg(max(col("rho")).as("rho"))

    def time(label: String)(build: => DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to reps) {
      time(s"rep$r lazy        ")(propagate(propagate(r0)))
      time(s"rep$r checkpointed")(propagate(propagate(r0).localCheckpoint()))
    }
    spark.stop()
  }
}
