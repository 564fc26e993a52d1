package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B for gr2's LabelProp loop: the current fully-lazy
  * 3-round chain (one mega-plan, AQE discovers label sizes only as
  * stages finish) vs an eager localCheckpoint of each round's
  * NODE-scale label table (3 small jobs, each planned with real input
  * sizes — the Bfs.reach trade). Usage: ProfileGr2Rounds <sfDir> [reps].
  */
object ProfileGr2Rounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sym() = {
      val e = graft.queries.GraphQueries.graphBase(spark, sfDir).eSev
      e.select(col("src").as("a"), col("dst").as("b"))
        .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
    }

    def round(e: DataFrame, labels: DataFrame): DataFrame =
      e.join(labels, col("b") === col("id"))
        .select(col("a"), col("lbl"))
        .repartition(col("a"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("n"))
        .groupBy(col("a"))
        .agg(max(col("n") * lit(2147483648L) +
          (lit(2147483647L) - col("lbl"))).as("__packed"))
        .select(col("a").as("id"),
          (lit(2147483647L) - pmod(col("__packed"), lit(2147483648L)))
            .as("lbl"))

    def run(checkpointRounds: Boolean): DataFrame = {
      val e = sym().repartition(col("b")).dropDuplicates("a", "b").persist()
      var labels = e.select(col("a").as("id")).distinct()
        .withColumn("lbl", col("id"))
      for (_ <- 1 to 3) {
        labels = round(e, labels)
        if (checkpointRounds) labels = labels.localCheckpoint()
      }
      try labels.localCheckpoint(true)
      finally e.unpersist()
    }

    def time(label: String)(build: => DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to reps) {
      time(s"rep$r lazy chain    ")(run(checkpointRounds = false))
      time(s"rep$r per-round ckpt")(run(checkpointRounds = true))
    }
    spark.stop()
  }
}
