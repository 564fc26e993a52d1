package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // n>=5 timed iterations per query, report the MEDIAN: single-run
    // timings cannot distinguish plan cost from session noise (GC pause,
    // listener-bus backlog, JIT deopt) — the r3->r4 "regressions" in
    // d6/d7/a5 were unattributable precisely because each round had one
    // sample, and at median-of-3 the sf0.1 heavy queries still swung up
    // to ~2× (r6: gr1 samples [8.9, 4.3, 6.1]; the apparent pr1/d6
    // regressions were pure noise, proven by LOWER sf1 numbers). 5
    // iterations follow the sf1 protocol: two outliers per query can no
    // longer move the median.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    // fail loudly, not via IndexOutOfBounds on an empty sample median
    require(iters >= 1, s"SPARK_GRAFT_BENCH_ITERS must be >= 1, got $iters")
    // SharedBase build transparency: the memoized family bases (triangle
    // oriented+adjacency, dedup CC labels) construct ONCE per session —
    // during warmup — so every timed median below is a warm-index number.
    // This property makes SharedBase time (and force) each build; the
    // seconds surface as the `builds` dict on the JSON line, so the
    // artifact records what the warm numbers omit (r6 verdict: d7's
    // 0.16 s was unattributable without the build cost).
    System.setProperty("graft.bench.timeBuilds", "1")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
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
        "d7_dup_groups", "sim9_ivfpq_ann_topk", "gt2_triangle_top_nodes",
        // r11: gr6 is the cheapest consumer of the shared gr_edges base —
        // warming it here builds (and discloses) the base like tri_base
        "gr6_assortativity"))
      try SparkEntry.queries(wq)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    // noop sink: forces FULL materialization of every output column —
    // count() would let Catalyst prune the projections being measured.
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): Option[Double] = {
      // untimed GC between iterations (JMH discipline): without it, one
      // query's garbage (checkpoint blocks, shuffle buffers) surfaces as
      // GC pauses inside a LATER query's timed window — measured as d7
      // 2.9 s standalone vs 5-12 s in-bench
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); None }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2) // odd n -> middle; even n -> upper-middle
    }
    // SPARK_GRAFT_BENCH_ONLY=q1,q2,... restricts the measured registry —
    // the sf1 scale-evidence runs time the fixed headline subset at 10×
    // data without paying for all 180+ queries × iterations there
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // unknown names fail LOUDLY: a typo'd subset entry silently dropping
    // a query would read as an improvement in round-over-round totals
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the registry: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val registry = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    val results = registry.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to iters).flatMap(_ => runOnce(fn, name))
      // ANY failed iteration marks the query failed (-1, excluded from the
      // total, listed explicitly) — a flaky query must never launder into
      // a clean artifact via the median of its surviving samples; the
      // samples line still carries whatever succeeded for diagnosis
      if (samples.size < iters) (name, -1.0, samples, false)
      else (name, median(samples), samples, true)
    }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def dict(rs: Seq[(String, Double, Seq[Double], Boolean)]): String =
      rs.map { case (k, v, _, ok) =>
        "\"" + k + "\":" + (if (ok) fmt(v) else "-1.0")
      }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => k }
    // the stdout line must stay under the 2000-char tail even on a
    // mass-failure run: cap the failures listed there (full list → file)
    def failArr(fs: Seq[String]) = fs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // total = sum of per-query MEDIANS (not wall-clock: iterations of the
    // same query are consecutive, so wall-clock would triple-count)
    val total = results.collect { case (_, v, _, true) => v }.sum
    // n_queries rides the line because the stdout "queries" dict is only
    // the headline subset: without the count, a total that grew because
    // the REGISTRY grew (74 → 182 queries across rounds) reads as a
    // regression in round-over-round comparison
    // memoized-base build costs (timed in SharedBase under the property
    // set above; built during warmup, so absent from every per-query
    // median): ride the line so rounds compare honestly. NOT added into
    // `value` — the total stays sum-of-medians, comparable to prior
    // rounds; the builds dict is the disclosure.
    val builds = graft.ops.SharedBase.buildSeconds.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    def line(qs: String, fs: Seq[String]) =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failures":${failed.size},"iters":$iters,"stat":"median","builds":$builds,"queries":$qs,"failures":${failArr(fs)},"sf":"$sfDir"}"""
    // full artifact → file: the median dict for ALL queries plus every raw
    // sample, so a future round can re-derive spread (max-min) and tell
    // noise from plan regression without re-running. The driver reads a
    // 2000-char stdout TAIL, so stdout carries only the total + a fixed
    // headline subset (one per operator family plus the known hotspots).
    def samplesDict(rs: Seq[(String, Double, Seq[Double], Boolean)]): String =
      rs.map { case (k, _, ss, _) =>
        "\"" + k + "\":" + ss.map(fmt).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line(dict(results), failed) + "\n" +
        s"""{"metric":"samples","iters":$iters,"sf":"$sfDir","samples":${samplesDict(results)}}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val headline = Set(
      "ao4_asof_native", "t18_bm25",
      "q1_agg", "m5_pipeline_screen", "screen_e2e_fixture",
      "d4_lsh_candidate_pairs", "d6_ngram_jaccard", "d7_dup_groups",
      "d11b_semdedup_kmeans", "d13_simhash64_band_pairs",
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
