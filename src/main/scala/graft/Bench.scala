package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // ERROR, not WARN: d7's localCheckpoint unpersist emits hundreds of
    // benign lineage-truncation WARNs that drown the one-line JSON output
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup absorbs JVM/codegen JIT so the measured loop reflects
    // steady-state execution, not first-compile: one representative per
    // heavy kernel family (decimal agg, rollup, window, minhash chain,
    // top-k aggregator, iterative CC loop, PQ/ADC kernels). Measured:
    // cold-vs-warm was 8.7s vs 1.2s on c1_rollup, 6.2s vs 0.8s on
    // a8_topk_agg, 12.9s vs 3.5s on d8_dedup_apply (whose CC family
    // d7 warms), 4.6s vs 2.9s on sim9 — first-compile noise that
    // swamped real plan-cost signal in the per-query history.
    for (wq <- Seq("q1_agg", "c1_rollup", "w2_lag_delta",
        "d3_minhash_signatures", "a8_topk_agg",
        "d7_dup_groups", "sim9_ivfpq_ann_topk"))
      try SparkEntry.queries(wq)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    // noop sink: forces FULL materialization of every output column —
    // count() would let Catalyst prune the projections being measured.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // untimed GC between queries (JMH discipline): without it, one
      // query's garbage (checkpoint blocks, shuffle buffers) surfaces as
      // GC pauses inside a LATER query's timed window — measured as d7
      // 2.9 s standalone vs 5-12 s in-bench
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a failed query must read as failure, never as a fast run: it reports
    // -1 and is excluded from the total, and the failures list is explicit
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def dict(rs: Seq[(String, Double, Boolean)]): String = rs.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) fmt(v) else "-1.0")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => k }
    // the stdout line must stay under the 2000-char tail even on a
    // mass-failure run: cap the failures listed there (full list → file)
    def failArr(fs: Seq[String]) = fs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // n_queries rides the line because the stdout "queries" dict is only
    // the headline subset: without the count, a total that grew because
    // the REGISTRY grew (74 → 128 queries across rounds) reads as a
    // regression in round-over-round comparison
    def line(qs: String, fs: Seq[String]) =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failures":${failed.size},"queries":$qs,"failures":${failArr(fs)},"sf":"$sfDir"}"""
    // full per-query map → file; the driver reads a 2000-char stdout TAIL
    // (BENCH_r01/r02 "tail"), so the stdout line must stay well under that —
    // it carries the total plus a fixed headline subset for regression
    // tracking, one per operator family plus the known hotspots
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line(dict(results), failed) + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val headline = Set(
      "ao4_asof_native", "t18_bm25",
      "q1_agg", "m5_pipeline_screen", "screen_e2e_fixture",
      "d4_lsh_candidate_pairs", "d6_ngram_jaccard", "d7_dup_groups",
      "sim1_bruteforce_topk", "sim2b_neardup_bucketed", "sim5_ivf_ann_topk",
      "t1_langid", "a5_grouped_regression", "a7_grouped_exists_keep",
      "a8_group_topk", "ao1_asof_join", "j4_composite_key_left_join",
      "e2_sessionize", "g1_enumerate_explode", "pr1_parity_report",
      "rj2_interval_overlap", "w1_running_sum")
    val failedShown = failed.take(10)
    println(line(dict(results.filter(r => headline(r._1) || failedShown.contains(r._1))),
      failedShown))
    spark.stop()
  }
}
