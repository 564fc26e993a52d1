package graft.tools

import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of the FULL gt5 plan with the typed (r8–r10)
  * vs native (r11) capped-neighborhood aggregate — the cross-round drift
  * killer: both arms share warmup, JIT, and cache state, so the delta is
  * the aggregate's contribution to the whole query.
  * Usage: ProfileGt5Full <sfDir> [reps].
  */
object ProfileGt5Full {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def tail(capped: org.apache.spark.sql.DataFrame) = {
      val tb = graft.queries.GraphQueries.triBase(spark, sfDir)
      val pairRows = capped.select(
        explode(graft.functions.Exprs.packedPairs(col("ns"))).as("k"))
      val edgeRows = tb.oriented.select(
        ((least(col("src"), col("dst")) * lit(4294967296L) +
          greatest(col("src"), col("dst"))) * 2).as("k"))
      graft.ops.TopPairs.runLengthTopK(
          spark, pairRows.unionByName(edgeRows), 20)
        .toDF("uv", "n_common")
        .orderBy(col("n_common").desc, col("uv"))
        .limit(20)
        .select(expr("uv div 4294967296L").as("u"),
          (col("uv") % 4294967296L).as("v"), col("n_common"))
    }
    def sym() = {
      val tb = graft.queries.GraphQueries.triBase(spark, sfDir)
      tb.oriented.select(
          explode(array(
            struct(col("src").as("c"), col("dst").as("n")),
            struct(col("dst").as("c"), col("src").as("n")))).as("e"))
        .select(col("e.c").as("c"), col("e.n").as("n"))
    }
    def typedQ() = {
      val agg = new graft.functions.TopKAggregator.SmallestLongs(64)
      tail(sym().as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
        .agg(agg.toColumn).toDF("c", "ns"))
    }
    def nativeQ() = tail(sym().groupBy(col("c"))
      .agg(graft.functions.SmallestKLongsAgg.smallestK(col("n"), 64)
        .as("ns")))

    def time(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // one untimed warmup per arm
    typedQ().write.format("noop").mode("overwrite").save()
    nativeQ().write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      time(s"rep$r typed ")(typedQ())
      time(s"rep$r native")(nativeQ())
    }
    spark.stop()
  }
}
