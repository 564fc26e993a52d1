package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-level interleaved A/B of the tri_base build (the heaviest build
  * in the sf10 artifact: 157.6 s in BENCH_sf10_s5.json, feeding
  * gt1/gt2/gt4). Arms:
  *
  *   coEdges  OLD: distinct (o,p) → self-join on o → filter p<p2 → distinct
  *            NEW: groupBy(o) collect_set → PackedPairsExpr explode →
  *                 distinct on ONE packed BIGINT → unpack
  *   adjacency OLD: sort_array(collect_list) over persisted oriented
  *             NEW: CollectSortedLongsAgg (primitive buffer)
  *             PRE: NEW over oriented pre-partitioned by src (groupBy
  *                  rides the existing partitioning — no exchange)
  *   full build OLD vs NEW (packed coEdges + repartition(src) before
  *              checkpoint + native adjacency)
  *
  * Interleaved reps in one JVM — the only protocol this box's timing
  * drift respects (see PLANS.md r11). Usage: ProfileTriBase <sfDir> [reps].
  */
object ProfileTriBase {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(build: => DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))

    def coOld(): DataFrame = {
      val pairs = li.distinct()
      pairs.join(pairs.select(col("o"), col("p").as("p2")), "o")
        .filter(col("p") < col("p2"))
        .select(col("p").as("u"), col("p2").as("v")).distinct()
    }
    def coNew(): DataFrame =
      li.groupBy("o")
        .agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(graft.functions.Exprs.packedPairs(col("ps"))).as("k"))
        .distinct()
        .select(expr("shiftright(k, 1) div 4294967296L").as("u"),
          (expr("shiftright(k, 1)") % 4294967296L).as("v"))

    println(s"[profile] coEdges old rows: ${coOld().count()}")
    println(s"[profile] coEdges new rows: ${coNew().count()}")

    for (r <- 1 to reps) {
      time(s"rep$r coEdges old")(coOld())
      time(s"rep$r coEdges new")(coNew())
    }

    // adjacency arms over a shared persisted oriented edge list
    val oriented = graft.ops.Triangles.orient(coNew(), "u", "v").persist()
    println(s"[profile] oriented rows: ${oriented.count()}")
    val orientedPre = oriented.repartition(col("src")).persist()
    orientedPre.count()

    def adjOld() = oriented.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    def adjNew() = oriented.groupBy("src")
      .agg(graft.functions.CollectSortedLongsAgg
        .collectSorted(col("dst")).as("nbrs"))
    def adjPre() = orientedPre.groupBy("src")
      .agg(graft.functions.CollectSortedLongsAgg
        .collectSorted(col("dst")).as("nbrs"))

    for (r <- 1 to reps) {
      time(s"rep$r adjacency old")(adjOld())
      time(s"rep$r adjacency new")(adjNew())
      time(s"rep$r adjacency pre")(adjPre())
    }
    oriented.unpersist(); orientedPre.unpersist()

    // full-build arms (checkpointed, like the real SharedBase build)
    def fullOld(): DataFrame = {
      val o = graft.ops.Triangles.orient(coOld(), "u", "v")
        .localCheckpoint(eager = true)
      val a = o.groupBy("src")
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        .localCheckpoint(eager = true)
      a
    }
    def fullNew(): DataFrame = {
      val o = graft.ops.Triangles.orient(coNew(), "u", "v")
        .repartition(col("src"))
        .localCheckpoint(eager = true)
      val a = o.groupBy("src")
        .agg(graft.functions.CollectSortedLongsAgg
          .collectSorted(col("dst")).as("nbrs"))
        .localCheckpoint(eager = true)
      a
    }
    for (r <- 1 to reps) {
      time(s"rep$r full old")(fullOld())
      time(s"rep$r full new")(fullNew())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
