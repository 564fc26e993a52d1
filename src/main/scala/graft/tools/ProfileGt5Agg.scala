package graft.tools

import org.apache.spark.sql.functions._

/** Isolated A/B of gt5's capped-neighborhood aggregation stage: the typed
  * Aggregator (r8–r10) vs the native TypedImperativeAggregate (r11), on
  * the real symmetric edge list, interleaved reps so JIT/cache state
  * can't favor one arm. Usage: ProfileGt5Agg <sfDir> [reps].
  */
object ProfileGt5Agg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tb = graft.queries.GraphQueries.triBase(spark, sfDir)
    val sym = tb.oriented.select(
        explode(array(
          struct(col("src").as("c"), col("dst").as("n")),
          struct(col("dst").as("c"), col("src").as("n")))).as("e"))
      .select(col("e.c").as("c"), col("e.n").as("n"))
      .persist()
    println(s"[profile] sym rows: ${sym.count()}")

    def time(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def typed() = {
      val agg = new graft.functions.TopKAggregator.SmallestLongs(64)
      sym.as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
        .agg(agg.toColumn).toDF("c", "ns")
    }
    def native() = sym.groupBy(col("c"))
      .agg(graft.functions.SmallestKLongsAgg.smallestK(col("n"), 64).as("ns"))

    for (r <- 1 to reps) {
      time(s"rep$r typed  ")(typed())
      time(s"rep$r native ")(native())
    }
    // fallback-threshold sensitivity: the partial ObjectHashAggregate map
    // falls back to sort past this many keys; sweep to see if it matters
    for (th <- Seq("4096", "262144", "4194304")) {
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", th)
      time(s"native thresh=$th")(native())
    }
    spark.stop()
  }
}
