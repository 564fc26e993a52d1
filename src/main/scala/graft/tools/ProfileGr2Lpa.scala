package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isolated A/B of gr2's per-round LPA argmax: the r10 row_number-window
  * spelling (plus the caller's pre-distinct) vs the r11 packed-integer
  * max with the dedup riding propagate's own exchange. Interleaved reps
  * on the real symmetric co-edge frame so JIT/heap state can't favor one
  * arm. Usage: ProfileGr2Lpa <sfDir> [reps].
  */
object ProfileGr2Lpa {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e0 = graft.queries.GraphQueries.graphBase(spark, sfDir).e
    val symRaw = e0.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(e0.select(col("dst").as("a"), col("src").as("b")))

    def rounds(e: DataFrame, round: DataFrame => DataFrame): DataFrame = {
      var labels = e.select(col("a").as("id")).distinct()
        .withColumn("lbl", col("id"))
      for (_ <- 1 to 3)
        labels = round(e.join(labels, col("b") === col("id"))
          .select(col("a"), col("lbl"))
          .repartition(col("a"))
          .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("n")))
      labels
    }
    // r10 arm: caller pre-distincts, per-round row_number window
    def windowed(): DataFrame = {
      val e = symRaw.distinct().repartition(col("b")).persist()
      val w = Window.partitionBy("a").orderBy(col("n").desc, col("lbl").asc)
      val out = rounds(e, f => f.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).select(col("a").as("id"), col("lbl")))
      try out.localCheckpoint(true) finally e.unpersist()
    }
    // r11 arm: dedup inside the repartition(b), packed-integer argmax
    def packed(): DataFrame = {
      val e = symRaw.repartition(col("b")).dropDuplicates("a", "b").persist()
      val out = rounds(e, f => f.groupBy(col("a"))
        .agg(max(col("n") * lit(2147483648L) +
          (lit(2147483647L) - col("lbl"))).as("__packed"))
        .select(col("a").as("id"),
          (lit(2147483647L) - pmod(col("__packed"), lit(2147483648L)))
            .as("lbl")))
      try out.localCheckpoint(true) finally e.unpersist()
    }
    def time(label: String)(build: => DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to reps) {
      time(s"rep$r windowed")(windowed())
      time(s"rep$r packed  ")(packed())
    }
    spark.stop()
  }
}
