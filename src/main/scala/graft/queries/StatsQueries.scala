package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableHash
import graft.ops.Num

/** Statistical operators over the corpus: exact stratified sampling and a
  * chi-square independence readout — the experiment-analysis companions to
  * `ab1_welch_ttest` (CubeQueries).
  *
  * Both are ONE-pass shapes: the sample is a pure row-local predicate (no
  * shuffle at all — the 100-TB plan is a filtered scan), and the chi-square
  * reduces the fact table once, then does all marginal/expectation algebra
  * on the tiny cell table. Cross-engine exactness comes from the same
  * discipline as t20: deterministic affine-rehashed polyHash uniforms,
  * integer counts, fixed IEEE double trees, decimal-pinned accumulation.
  */
object StatsQueries extends QueryPack {

  // Same affine-rehash rationale as t20 (TextQueries.scala): raw polyHash
  // of short prefixed ids lands in narrow bands; one multiply by the Knuth
  // constant mod P spreads them before the uniform is taken.
  private val (sA, sB) = StableHash.affineParams(1).head

  // Benford expected first-digit shares, round(1e6·log10(1+1/d)) for
  // d=1..9 — NINE integer ppm constants precomputed once and emitted as
  // the SAME SQL literal expression by Spark and the DuckDB oracle, so
  // st6's hash gate never depends on two libms' ln() agreeing to the
  // last ulp. 301030+176091+124939+96910+79181+66947+57992+51153+45757
  // = 1_000_000 exactly (the rounded shares happen to telescope).
  private[queries] val BenfordExpPpmSql: String =
    """CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                  WHEN 4 THEN 96910  WHEN 5 THEN 79181  WHEN 6 THEN 66947
                  WHEN 7 THEN 57992  WHEN 8 THEN 51153  ELSE 45757
       END""".stripMargin.replaceAll("\\s+", " ").trim

  // Per-segment sampling fractions — deliberately spread over two orders
  // of magnitude so the test at sf0.01 exercises both heavy and thin keeps.
  private val Fractions = Seq(
    "AUTOMOBILE" -> 0.75, "BUILDING" -> 0.50, "MACHINERY" -> 0.25,
    "FURNITURE" -> 0.10, "HOUSEHOLD" -> 0.05)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact stratified sampling: keep iff u(c_custkey) < f(stratum). The
    // whole operator is a row-local predicate — zero exchanges, fully
    // codegen'd, trivially parallel at any scale — and reproducible: the
    // same row is kept in every run on every cluster layout. (Contrast
    // df.sampleBy, which is seeded per-partition and changes with the
    // partitioning.)
    "st1_stratified_sample" -> ((s, d) => {
      val u = ((StableHash.polyHash(concat_ws("",
        lit("strat|"), col("c_custkey").cast("string")))
        * lit(sA) + lit(sB)) % lit(StableHash.P) + lit(1.0))
        .cast("double") / lit((StableHash.P + 1).toDouble)
      val f = Fractions.tail.foldLeft(
        when(col("c_mktsegment") === Fractions.head._1,
          lit(Fractions.head._2))) { case (acc, (seg, fr)) =>
        acc.when(col("c_mktsegment") === seg, lit(fr))
      }.otherwise(lit(0.0))
      Tables.customer(s, d)
        .filter(u < f)
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Chi-square independence test of mktsegment × orderpriority: the fact
    // join+aggregate is the only wide work (customer dim broadcast); the
    // 25-row cell table carries marginals via windows and the statistic is
    // Σ (obs−exp)²/exp with exp = rowTot·colTot/total — integer counts, a
    // fixed IEEE tree per cell, decimal-pinned final sum.
    "st2_chi2_independence" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("obs"))
      val withMarg = cells
        .withColumn("row_tot", sum(col("obs")).over(Window.partitionBy("seg")))
        .withColumn("col_tot", sum(col("obs")).over(Window.partitionBy("prio")))
        .withColumn("total", sum(col("obs")).over(Window.partitionBy()))
      val exp = (col("row_tot").cast("double") * col("col_tot").cast("double")
        / col("total").cast("double"))
      withMarg
        .select(col("seg"), col("prio"), col("obs"),
          ((col("obs").cast("double") - exp) * (col("obs").cast("double") - exp)
            / exp).as("term"))
        .agg(Num.dsum(col("term")).as("chi2_stat"),
          ((countDistinct(col("seg")) - 1) * (countDistinct(col("prio")) - 1))
            .as("dof"))
    }),

    // Two-sample Kolmogorov–Smirnov statistic (click vs purchase value
    // distributions): D = max_x |F1(x) − F2(x)|. The scalable spelling
    // quantizes values to a bounded grid FIRST (integer cents — exact for
    // this corpus's 2-decimal values), so the only data-scale work is one
    // keyed aggregate to per-cell counts; the ECDF window then runs over
    // the REDUCED cell table, whose size is bounded by the grid resolution
    // (≤ value-range × 100 rows), not by the data — the sky1/e14
    // bounded-domain discipline for the otherwise-unpartitionable global
    // order. Cross-engine exactness: counts are integers, the max is taken
    // over |f1·n2 − f2·n1| (integers), and only the final single-row
    // statistic divides — exact-integer doubles divide identically on both
    // engines.
    "st3_ks_test" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase") &&
          col("value").isNotNull)
        .select(col("event_type").as("t"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy("cents")
        .agg(sum(when(col("t") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("t") === "purchase", 1L).otherwise(0L)).as("c2"))
      val ecdf = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("f1", sum(col("c1")).over(ecdf))
        .withColumn("f2", sum(col("c2")).over(ecdf))
        .withColumn("n1", sum(col("c1")).over(Window.partitionBy()))
        .withColumn("n2", sum(col("c2")).over(Window.partitionBy()))
        .groupBy("n1", "n2")
        .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
          .as("dmax"))
        .select(col("n1"), col("n2"),
          (col("dmax").cast("double")
            / (col("n1").cast("double") * col("n2").cast("double")))
            .as("ks_stat"))
    }),

    // Mann–Whitney U (rank-sum) — the nonparametric two-sample location
    // test beside st3's distribution test, ties handled by midranks. Same
    // bounded-domain discipline: quantize to integer cents FIRST, so the
    // only data-scale work is one keyed aggregate to per-cell counts; the
    // rank window runs over the REDUCED cell table (grid-bounded rows).
    // Exactness: midranks are half-integers, so everything is carried
    // DOUBLED (2·midrank = 2·cumcount − cellsize + 1 — an integer);
    // only the final 1-row U and AUC divide, and exact-int doubles divide
    // identically cross-engine.
    "st4_mannwhitney" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase") &&
          col("value").isNotNull)
        .select(col("event_type").as("t"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy("cents")
        .agg(sum(when(col("t") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("t") === "purchase", 1L).otherwise(0L)).as("c2"))
      val ecdf = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("m", col("c1") + col("c2"))
        .withColumn("cumt", sum(col("m")).over(ecdf))
        .withColumn("rx2", col("cumt") * 2 - col("m") + 1)
        .withColumn("n1", sum(col("c1")).over(Window.partitionBy()))
        .withColumn("n2", sum(col("c2")).over(Window.partitionBy()))
        .groupBy("n1", "n2")
        .agg(sum(col("c1") * col("rx2")).as("r1x2"))
        .withColumn("u1x2", col("r1x2") - col("n1") * (col("n1") + 1))
        .select(col("n1"), col("n2"),
          (col("u1x2").cast("double") / lit(2.0)).as("u1"),
          (col("u1x2").cast("double") /
            (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
            .as("auc"))
    }),

    // Population Stability Index — the score-drift metric every ML
    // serving pipeline monitors: PSI = Σ (p−q)·ln(p/q) between the click
    // and purchase value distributions over $25-wide bins. Same
    // bounded-domain discipline as st3/st4: ONE data-scale keyed
    // aggregate to per-bin counts; everything after runs on the
    // grid-bounded cell table. Laplace (+1) smoothing keeps empty-side
    // bins finite and deterministic (no epsilon constant to disagree
    // on); p/q are exact rationals cast once, the per-bin term is a
    // fixed IEEE tree (ln correctly rounded — t19's rule), and the sum
    // is Num-pinned so partitioning can't reorder it.
    "st5_psi" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase") &&
          col("value").isNotNull)
        .select(col("event_type").as("t"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .withColumn("bin", expr("cents div 2500"))
        .groupBy("bin")
        .agg(sum(when(col("t") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("t") === "purchase", 1L).otherwise(0L)).as("c2"))
      val tot = cells.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        count(lit(1)).as("nb"))
      cells.crossJoin(broadcast(tot))
        .withColumn("p", (col("c1") + lit(1)).cast("double") /
          (col("n1") + col("nb")).cast("double"))
        .withColumn("q", (col("c2") + lit(1)).cast("double") /
          (col("n2") + col("nb")).cast("double"))
        .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
        .groupBy("n1", "n2", "nb")
        .agg(Num.dsum(col("term")).as("psi"))
        .select(col("n1"), col("n2"), col("nb").as("n_bins"), col("psi"))
    }),

    // Weighted median (quantity-weighted l_extendedprice per returnflag):
    // the order-statistic robust aggregate. One keyed aggregate collapses
    // the fact table to per-(group, value) weight cells; the cumulative
    // window runs per group (partitioned — scalable), and the median is
    // the smallest value whose doubled cumulative weight reaches the group
    // total. All-integer weights ⇒ no float accumulation anywhere; the
    // 2·cumw ≥ tot comparison sidesteps the /2 rounding question entirely.
    "a13_weighted_median" -> ((s, d) => {
      val cells = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v"),
          col("l_quantity").cast("bigint").as("w"))
        .groupBy("flag", "v").agg(sum(col("w")).as("w"))
      cells
        .withColumn("cumw", sum(col("w")).over(
          Window.partitionBy("flag").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("totw", sum(col("w")).over(Window.partitionBy("flag")))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy("flag")
        .agg(min(col("v")).as("w_median"),
          max(col("totw")).as("total_weight"))
        .orderBy("flag")
    }),

    // Benford first-digit audit of order totals — the classic
    // fabricated-numbers screen a finance/DQ pipeline runs. ONE data-scale
    // keyed aggregate to 9 digit cells; everything after is 9-row algebra.
    // The first significant digit comes from the DECIMAL STRING of the
    // integer cents (both engines render a positive bigint identically) —
    // never from log10, whose engine rounding at exact powers of ten
    // would misclassify boundary values. Expected shares are NINE
    // PRECOMPUTED INTEGER ppm literals, round(1e6·log10(1+1/d)), shared
    // verbatim by both engines — an in-engine ln() would tie the hash
    // gate to two libms agreeing to the last ulp (neither JVM Math.log
    // nor libm std::log is guaranteed correctly rounded), a
    // platform-fragile comparison for a constant that never changes.
    "st6_benford" -> ((s, d) => {
      val digits = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      digits
        .withColumn("total", sum(col("n_obs")).over(Window.partitionBy()))
        .select(col("digit"), col("n_obs"),
          expr("(1000000 * n_obs) div total").as("obs_ppm"),
          expr(BenfordExpPpmSql).as("exp_ppm"))
        .orderBy("digit")
    }),

    // Two-sided 10% trimmed mean of order totals per priority — the
    // robust location estimate between a plain mean (outlier-hostage) and
    // a13's median (discards too much). Same cell discipline: ONE keyed
    // aggregate to per-(prio, cents) integer weight cells, the cumulative
    // runs per-priority over the grid-bounded cell table, and each cell
    // keeps weight clamp(min(cum, N−k) − max(cum−w, k), ≥0) with
    // k = N div 10 — all integers; the mean divides ONCE at the end
    // (exact-int doubles divide identically cross-engine).
    "st7_trimmed_mean" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .groupBy("prio", "cents").agg(count(lit(1)).as("w"))
      val byP = Window.partitionBy("prio")
      cells
        .withColumn("cumw", sum(col("w")).over(
          byP.orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("w")).over(byP))
        .withColumn("k", expr("n div 10"))
        .withColumn("kept",
          greatest(least(col("cumw"), col("n") - col("k"))
            - greatest(col("cumw") - col("w"), col("k")), lit(0L)))
        .groupBy("prio")
        .agg(max(col("n")).as("n"), max(col("k")).as("n_trimmed_each_side"),
          sum(col("cents") * col("kept")).as("s"), sum(col("kept")).as("m"))
        .select(col("prio"), col("n"), col("n_trimmed_each_side"),
          (col("s").cast("double") / col("m").cast("double") / lit(100.0))
            .as("trimmed_mean"))
        .orderBy("prio")
    }),

    // Median absolute deviation of order totals per priority — the robust
    // SCALE estimate beside st7's location (together they replace
    // mean/stddev for outlier-heavy monitoring). Two rounds of the a13
    // weighted-median cell discipline: median over (prio, cents) cells,
    // then a prio-keyed join-back and a second weighted median over the
    // |cents − median| deviation cells — both windows partitioned, both
    // cell tables grid-bounded, zero float accumulation (cents stay
    // integers until the final /100).
    "st8_mad" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .groupBy("prio", "cents").agg(count(lit(1)).as("w"))
      def wmedian(df: DataFrame, valueCol: String): DataFrame = {
        val byP = Window.partitionBy("prio")
        df.withColumn("cumw", sum(col("w")).over(
            byP.orderBy(valueCol)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("totw", sum(col("w")).over(byP))
          .filter(col("cumw") * 2 >= col("totw"))
          .groupBy("prio")
          .agg(min(col(valueCol)).as("med"), max(col("totw")).as("n"))
      }
      val med = wmedian(cells, "cents")
      val dev = cells.join(med, Seq("prio"))
        .select(col("prio"), abs(col("cents") - col("med")).as("dev"), col("w"))
        .groupBy("prio", "dev").agg(sum(col("w")).as("w"))
      wmedian(dev, "dev")
        .select(col("prio"), col("n"),
          (col("med").cast("double") / lit(100.0)).as("mad_price"))
        .join(med.select(col("prio"),
          (col("med").cast("double") / lit(100.0)).as("median_price")), Seq("prio"))
        .select("prio", "n", "median_price", "mad_price")
        .orderBy("prio")
    }),

    // Binned-quantile calibration — the deterministic scale-path analogue
    // of approx_percentile: a fixed 256-bin equi-width histogram over the
    // per-priority cents span estimates the median (bin midpoint), read
    // out against the exact weighted median. This is the quantile twin of
    // d20/hh2/sim10's sketch-calibration discipline — Spark's own
    // approx_percentile and DuckDB's are different sketches and can't
    // oracle each other, so the sketch itself is built portably. ONE
    // data-scale keyed aggregate (the cents cells); the span, histogram,
    // cumulative and midpoint all derive from the grid-bounded cell
    // table, and every column is an integer (midpoint via
    // lo + ((2·bin+1)·width) div 512 — no doubles anywhere).
    "st9_binned_quantile_calibration" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .groupBy("prio", "cents").agg(count(lit(1)).as("w"))
      val byP = Window.partitionBy("prio")
      val exact = cells
        .withColumn("cumw", sum(col("w")).over(byP.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("totw", sum(col("w")).over(byP))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy("prio").agg(min(col("cents")).as("exact_median_cents"),
          max(col("totw")).as("n"))
      val span = cells.groupBy("prio")
        .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      val medBin = cells.join(span, "prio")
        .withColumn("bin", expr("((cents - lo) * 256) div (hi - lo + 1)"))
        .groupBy("prio", "bin").agg(sum(col("w")).as("bw"))
        .withColumn("cum", sum(col("bw")).over(byP.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum(col("bw")).over(byP))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("prio").agg(min(col("bin")).as("med_bin"))
      exact.join(medBin, "prio").join(span, "prio")
        .withColumn("est_cents",
          expr("lo + ((2 * med_bin + 1) * (hi - lo + 1)) div 512"))
        .withColumn("err_ppm",
          expr("(1000000 * abs(est_cents - exact_median_cents))" +
            " div exact_median_cents"))
        .select("prio", "n", "exact_median_cents", "med_bin", "est_cents",
          "err_ppm")
        .orderBy("prio")
    }),

    // CUPED variance reduction (the industry-standard experiment-analysis
    // adjustment): per-user post-period metric Y adjusted by the
    // pre-period covariate X — theta = cov(X,Y)/var(X), and the variance
    // the adjustment removes is exactly corr²(X,Y). The split day is
    // data-derived (min day + 15, one broadcast row). Exactness: cents
    // quantization, per-user X/Y are exact BIGINT conditional sums, the
    // five moments accumulate in DECIMAL(38,0) (the gr6 spelling — n·Σx²
    // would pass BIGINT only to ~60× sf10), and the final theta/r² are
    // three identically-associated double ops on decimal-cast values.
    // Scale shape: ONE user-keyed aggregate then a 1-row reduce; no
    // window, no join beyond the broadcast split constant.
    // Two-proportion z-test on user conversion (a purchase above $90 —
    // "any purchase" saturates at 100% on this corpus, degenerating the
    // pooled variance to 0) by a deterministic id-parity variant split —
    // the categorical-outcome companion to ab1's Welch t (continuous)
    // and ab2's CUPED (variance-reduced). ONE user-keyed aggregate → a
    // 2-row cell table → a 1-row readout; conversion rates as integer
    // ppm, z as one fixed IEEE tree (pooled p, sqrt correctly rounded —
    // ab1's rule), NULL-guarded against an all-or-none pooled rate.
    "st10_two_proportion_ztest" -> ((s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 90.0, 1L).otherwise(0L))
          .as("converted"))
        .select((col("user_id") % 2).as("variant"), col("converted"))
      val cells = u.groupBy("variant")
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("x"))
      val a = cells.filter(col("variant") === 0)
        .select(col("n").as("n1"), col("x").as("x1"))
      val b = cells.filter(col("variant") === 1)
        .select(col("n").as("n2"), col("x").as("x2"))
      a.crossJoin(broadcast(b))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          expr("(1000000 * x1) div n1").as("cvr1_ppm"),
          expr("(1000000 * x2) div n2").as("cvr2_ppm"),
          when(col("x1") + col("x2") > 0 &&
              col("x1") + col("x2") < col("n1") + col("n2"),
            (col("x1").cast("double") / col("n1").cast("double") -
              col("x2").cast("double") / col("n2").cast("double")) /
              sqrt(((col("x1") + col("x2")).cast("double") /
                  (col("n1") + col("n2")).cast("double")) *
                (lit(1.0) - (col("x1") + col("x2")).cast("double") /
                  (col("n1") + col("n2")).cast("double")) *
                (lit(1.0) / col("n1").cast("double") +
                  lit(1.0) / col("n2").cast("double")))).as("z"))
    }),

    "ab2_cuped" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        expr(s"ts DIV ${24L * 3600 * 1000 * 1000 * 1000}").as("day"),
        round(col("value") * 100).cast("bigint").as("cents"))
      val mn = ev.agg(min(col("day")).as("mind"))
      val ux = ev.crossJoin(broadcast(mn))
        .groupBy("user_id")
        .agg(
          sum(when(col("day") < col("mind") + 15, col("cents"))
            .otherwise(0L)).as("x"),
          sum(when(col("day") >= col("mind") + 15, col("cents"))
            .otherwise(0L)).as("y"))
      val m = ux.agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
      m.select(col("n").as("n_users"),
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            .as("cov"),
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            .as("varx"),
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
            .as("vary"))
        .select(col("n_users"),
          (col("cov") / col("varx")).as("theta"),
          floor(lit(1000000.0) * (col("cov") * col("cov"))
            / (col("varx") * col("vary"))).cast("bigint")
            .as("var_reduction_ppm"))
    }),

    // Gini concentration of order value per priority class — the
    // inequality monitor a data-mixture pipeline runs on source/domain
    // contribution (a priority whose spend concentrates in a few orders
    // behaves differently from one with uniform spend). Exactness and
    // scale come from the st4/st8 cell discipline: ONE data-scale keyed
    // aggregate reduces orders to (prio, cents) cells with counts, the
    // ordered prefix walk runs over the VALUE-DOMAIN-bounded cell table,
    // and the pairwise |xi−xj| sum uses the sorted-prefix identity
    //   Σ_{i<j}|xi−xj| = Σ_k w_k·(v_k·N_below(k) − S_below(k))
    // so the statistic is integer-exact (decimal(38,0) guards the
    // v·N products past 2^63 at the 100-TB row count). G = pairs/(n·Σv).
    "st11_gini" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .groupBy("prio", "cents").agg(count(lit(1)).as("w"))
      val ord = Window.partitionBy("prio").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("sw", (col("cents") * col("w")).cast("decimal(38,0)"))
        .withColumn("cumw", sum(col("w")).over(ord))
        .withColumn("cums", sum(col("sw")).over(ord))
        .groupBy("prio")
        .agg(sum(col("w")).as("n"), sum(col("sw")).as("total"),
          sum(col("w").cast("decimal(38,0)") *
            (col("cents").cast("decimal(38,0)") * (col("cumw") - col("w"))
              - (col("cums") - col("sw")))).as("pairs"))
        .select(col("prio"), col("n").cast("bigint").as("n"),
          col("total").cast("bigint").as("total_cents"),
          (col("pairs").cast("double") /
            (col("n").cast("double") * col("total").cast("double")))
            .as("gini"))
        .orderBy("prio")
    }),

    // Kendall tau-b rank correlation between daily click traffic and
    // daily purchase revenue — the monotone-association companion to
    // w8's Pearson window (tau survives outliers and nonlinear coupling
    // that break r). The quadratic pair term runs over the
    // CALENDAR-bounded daily table (w8's rule: one data-scale keyed
    // aggregate first), never over events; concordant/discordant/tied
    // counts are integers, the pair product rides decimal(38,0) (a
    // day-revenue delta × count delta can pass 2^63 at 100 TB), and
    // tau-b is one fixed double tree over five longs (sqrt correctly
    // rounded — ab1's rule).
    "st12_kendall_tau" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val daily = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase") &&
          col("value").isNotNull)
        .select(expr(s"ts DIV $dayNs").as("day"), col("event_type").as("t"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy("day")
        .agg(sum(when(col("t") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("t") === "purchase", col("cents")).otherwise(0L))
            .as("y"))
      val a = daily.select(col("day").as("d1"), col("x").as("x1"),
        col("y").as("y1"))
      val b = daily.select(col("day").as("d2"), col("x").as("x2"),
        col("y").as("y2"))
      // day-pair self-join: |daily| is CALENDAR-bounded (days of span,
      // not data volume — sf10 probe: 0.65× per 10× data), so the d1<d2
      // nested-loop join broadcasts the build side explicitly per the
      // cross-join lint rule
      a.join(broadcast(b), col("d1") < col("d2"))
        .select(((col("x2") - col("x1")).cast("decimal(38,0)") *
            (col("y2") - col("y1")).cast("decimal(38,0)")).as("prod"),
          (col("x1") === col("x2")).cast("long").as("tx"),
          (col("y1") === col("y2")).cast("long").as("ty"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("prod") > 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("prod") < 0, 1L).otherwise(0L)).as("nd"),
          sum(col("tx")).as("tied_x"), sum(col("ty")).as("tied_y"))
        .select(col("n_pairs"), col("nc"), col("nd"),
          col("tied_x"), col("tied_y"),
          ((col("nc") - col("nd")).cast("double") /
            sqrt((col("n_pairs") - col("tied_x")).cast("double") *
              (col("n_pairs") - col("tied_y")).cast("double")))
            .as("tau_b"))
    }),

    // p-chart (attribute control chart) on the daily error rate — the
    // SPC monitor an operations team runs on a pipeline's failure
    // fraction: centerline p̄ from the whole window, per-day 3σ limits
    // p̄ ± 3·√(p̄(1−p̄)/n_day) (limits tighten on busy days — the p-chart's
    // defining feature vs a fixed threshold), out-of-control days
    // flagged. Day cells are exact integers from ONE keyed aggregate;
    // the 1-row global stats broadcast back; σ is one fixed sqrt tree
    // (st12's discipline), limits decimal-pinned for the readout, and
    // the flag compares the SAME fixed trees both engines evaluate.
    "st15_p_chart" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val daily = Tables.events(s, d)
        .select(expr(s"ts DIV $dayNs").as("day"),
          when(col("event_type") === "error", 1L).otherwise(0L).as("isErr"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"), sum(col("isErr")).as("x"))
      val tot = daily.agg(sum(col("n")).as("tn"), sum(col("x")).as("tx"))
      daily.crossJoin(broadcast(tot))
        .withColumn("pbar", col("tx").cast("double") / col("tn").cast("double"))
        .withColumn("sigma",
          sqrt(col("pbar") * (lit(1.0) - col("pbar")) /
            col("n").cast("double")))
        .withColumn("p", col("x").cast("double") / col("n").cast("double"))
        .select(col("day"), col("n"), col("x"),
          expr("(1000000 * x) div n").as("rate_ppm"),
          (col("pbar") + lit(3.0) * col("sigma"))
            .cast("decimal(18,6)").cast("double").as("ucl"),
          greatest(col("pbar") - lit(3.0) * col("sigma"), lit(0.0))
            .cast("decimal(18,6)").cast("double").as("lcl"),
          (col("p") > col("pbar") + lit(3.0) * col("sigma")).as("above"),
          (col("p") < greatest(col("pbar") - lit(3.0) * col("sigma"),
            lit(0.0))).as("below"),
          // Western Electric zone-A warning: outside ±2σ but inside 3σ
          // — the early signal a chart watcher acts on before a hard
          // violation (and, on this in-control corpus, the tier that
          // actually varies: 3σ flags are honestly all-false here)
          (col("p") > col("pbar") + lit(2.0) * col("sigma") ||
            col("p") < greatest(col("pbar") - lit(2.0) * col("sigma"),
              lit(0.0))).as("warn_2s"))
        .orderBy("day")
    }),
  )

  private def uSql(keyExpr: String, prefix: String): String =
    s"""((${StableHash.polyHashSql(s"concat('$prefix', $keyExpr)")}
         * $sA + $sB) % ${StableHash.P} + 1.0) / ${StableHash.P + 1}.0"""

  val oracles: Map[String, String] = Map(
    "st1_stratified_sample" -> {
      val cases = Fractions.map { case (seg, fr) =>
        s"WHEN c_mktsegment = '$seg' THEN CAST($fr AS DOUBLE)"
      }.mkString(" ")
      s"""SELECT c_custkey, c_mktsegment FROM customer
          WHERE ${uSql("CAST(c_custkey AS VARCHAR)", "strat|")}
              < CASE $cases ELSE 0.0 END
          ORDER BY c_custkey"""
    },
    "st2_chi2_independence" ->
      s"""WITH cells AS (
            SELECT c_mktsegment AS seg, o_orderpriority AS prio,
                   count(*) AS obs
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2),
          m AS (
            SELECT seg, prio, obs,
                   sum(obs) OVER (PARTITION BY seg) AS row_tot,
                   sum(obs) OVER (PARTITION BY prio) AS col_tot,
                   sum(obs) OVER () AS total
            FROM cells),
          t AS (
            SELECT seg, prio, obs,
                   (CAST(obs AS DOUBLE)
                      - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                        / CAST(total AS DOUBLE))
                   * (CAST(obs AS DOUBLE)
                      - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                        / CAST(total AS DOUBLE))
                   / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                      / CAST(total AS DOUBLE)) AS term
            FROM m)
          SELECT ${Num.sqlSum("term")} AS chi2_stat,
                 CAST((count(DISTINCT seg) - 1) * (count(DISTINCT prio) - 1)
                      AS BIGINT) AS dof
          FROM t""",
    // Sums CAST to BIGINT at every step: DuckDB's integer sum() returns
    // HUGEINT, which would diverge from Spark's bigint schema.
    "st3_ks_test" ->
      """WITH cells AS (
           SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                  CAST(sum(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM events
           WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
           GROUP BY 1),
         cum AS (
           SELECT CAST(sum(c1) OVER (ORDER BY cents ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
                  CAST(sum(c2) OVER (ORDER BY cents ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2,
                  CAST(sum(c1) OVER () AS BIGINT) AS n1,
                  CAST(sum(c2) OVER () AS BIGINT) AS n2
           FROM cells)
         SELECT n1, n2,
                CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_stat
         FROM cum GROUP BY n1, n2""",
    // Doubled-midrank algebra mirrored exactly; sums CAST to BIGINT at
    // every step (DuckDB integer sum() returns HUGEINT — st3's rule).
    "st4_mannwhitney" ->
      """WITH cells AS (
           SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                  CAST(sum(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM events
           WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
           GROUP BY 1),
         cum AS (
           SELECT c1, c2, c1 + c2 AS m,
                  CAST(sum(c1 + c2) OVER (ORDER BY cents ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumt,
                  CAST(sum(c1) OVER () AS BIGINT) AS n1,
                  CAST(sum(c2) OVER () AS BIGINT) AS n2
           FROM cells),
         agg AS (
           SELECT n1, n2,
                  CAST(sum(c1 * (cumt * 2 - m + 1)) AS BIGINT) AS r1x2
           FROM cum GROUP BY n1, n2)
         SELECT n1, n2,
                CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
                CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) /
                  (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc
         FROM agg""",
    // same +1-smoothed rationals, same fixed term tree, Num-pinned sum
    "st5_psi" ->
      s"""WITH cells AS (
            SELECT CAST(round(value * 100) AS BIGINT) // 2500 AS bin,
                   CAST(sum(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c2
            FROM events
            WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
            GROUP BY 1),
          tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                         CAST(sum(c2) AS BIGINT) AS n2,
                         CAST(count(*) AS BIGINT) AS nb FROM cells),
          term AS (SELECT n1, n2, nb,
                          CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE) AS p,
                          CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE) AS q
                   FROM cells CROSS JOIN tot)
          SELECT n1, n2, nb AS n_bins,
                 ${Num.sqlSum("(p - q) * ln(p / q)")} AS psi
          FROM term GROUP BY n1, n2, nb""",
    "a13_weighted_median" ->
      """WITH cells AS (
           SELECT l_returnflag AS flag, l_extendedprice AS v,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
         cum AS (
           SELECT flag, v,
                  CAST(sum(w) OVER (PARTITION BY flag ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumw,
                  CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS totw
           FROM cells)
         SELECT flag, min(v) AS w_median, max(totw) AS total_weight
         FROM cum WHERE cumw * 2 >= totw
         GROUP BY flag ORDER BY flag""",

    // first digit from the integer-cents decimal string (never log10);
    // expected = the SAME nine precomputed integer ppm literals Spark
    // emits (BenfordExpPpmSql) — no in-engine ln(), no libm coupling
    "st6_benford" ->
      s"""WITH digits AS (
           SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INT) AS digit,
                  CAST(count(*) AS BIGINT) AS n_obs
           FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
           GROUP BY 1)
         SELECT digit, n_obs,
                CAST((1000000 * n_obs)
                     // CAST(sum(n_obs) OVER () AS BIGINT) AS BIGINT) AS obs_ppm,
                $BenfordExpPpmSql AS exp_ppm
         FROM digits ORDER BY digit""",

    // doubled nothing here — all-integer kept weights, one final divide
    "st7_trimmed_mean" ->
      """WITH cells AS (
           SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(count(*) AS BIGINT) AS w
           FROM orders GROUP BY 1, 2),
         cum AS (
           SELECT prio, cents, w,
                  CAST(sum(w) OVER (PARTITION BY prio ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumw,
                  CAST(sum(w) OVER (PARTITION BY prio) AS BIGINT) AS n
           FROM cells),
         kept AS (
           SELECT prio, cents, n, n // 10 AS k,
                  greatest(least(cumw, n - n // 10)
                           - greatest(cumw - w, n // 10), 0) AS kept
           FROM cum)
         SELECT prio, max(n) AS n, max(k) AS n_trimmed_each_side,
                CAST(CAST(sum(cents * kept) AS BIGINT) AS DOUBLE)
                  / CAST(CAST(sum(kept) AS BIGINT) AS DOUBLE) / 100.0
                  AS trimmed_mean
         FROM kept GROUP BY prio ORDER BY prio""",

    // two rounds of the a13 weighted-median cell form; cents stay
    // integers until the final /100
    "st8_mad" ->
      """WITH cells AS (
           SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(count(*) AS BIGINT) AS w
           FROM orders GROUP BY 1, 2),
         cum1 AS (
           SELECT prio, cents, w,
                  CAST(sum(w) OVER (PARTITION BY prio ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumw,
                  CAST(sum(w) OVER (PARTITION BY prio) AS BIGINT) AS totw
           FROM cells),
         med AS (SELECT prio, min(cents) AS med, max(totw) AS n
                 FROM cum1 WHERE cumw * 2 >= totw GROUP BY prio),
         dev AS (SELECT c.prio, abs(c.cents - m.med) AS dev,
                        CAST(sum(c.w) AS BIGINT) AS w
                 FROM cells c JOIN med m USING (prio)
                 GROUP BY 1, 2),
         cum2 AS (
           SELECT prio, dev, w,
                  CAST(sum(w) OVER (PARTITION BY prio ORDER BY dev
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumw,
                  CAST(sum(w) OVER (PARTITION BY prio) AS BIGINT) AS totw
           FROM dev),
         mad AS (SELECT prio, min(dev) AS mad, max(totw) AS n
                 FROM cum2 WHERE cumw * 2 >= totw GROUP BY prio)
         SELECT mad.prio, mad.n,
                CAST(med.med AS DOUBLE) / 100.0 AS median_price,
                CAST(mad.mad AS DOUBLE) / 100.0 AS mad_price
         FROM mad JOIN med USING (prio) ORDER BY mad.prio""",
    "st9_binned_quantile_calibration" ->
      """WITH cells AS (
           SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(count(*) AS BIGINT) AS w
           FROM orders GROUP BY 1, 2),
         cum AS (
           SELECT prio, cents, w,
                  CAST(sum(w) OVER (PARTITION BY prio ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumw,
                  CAST(sum(w) OVER (PARTITION BY prio) AS BIGINT) AS totw
           FROM cells),
         ex AS (SELECT prio, min(cents) AS exact_median_cents,
                       max(totw) AS n
                FROM cum WHERE cumw * 2 >= totw GROUP BY prio),
         span AS (SELECT prio, min(cents) AS lo, max(cents) AS hi
                  FROM cells GROUP BY prio),
         hist AS (SELECT cells.prio,
                         ((cents - lo) * 256) // (hi - lo + 1) AS bin,
                         CAST(sum(w) AS BIGINT) AS bw
                  FROM cells JOIN span USING (prio) GROUP BY 1, 2),
         hcum AS (
           SELECT prio, bin, bw,
                  CAST(sum(bw) OVER (PARTITION BY prio ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
                  CAST(sum(bw) OVER (PARTITION BY prio) AS BIGINT) AS tot
           FROM hist),
         mb AS (SELECT prio, min(bin) AS med_bin
                FROM hcum WHERE cum * 2 >= tot GROUP BY prio)
         SELECT ex.prio, ex.n, ex.exact_median_cents, mb.med_bin,
                lo + ((2 * med_bin + 1) * (hi - lo + 1)) // 512 AS est_cents,
                (1000000 * abs(lo + ((2 * med_bin + 1) * (hi - lo + 1)) // 512
                               - exact_median_cents))
                  // exact_median_cents AS err_ppm
         FROM ex JOIN mb USING (prio) JOIN span USING (prio)
         ORDER BY ex.prio""",

    "st10_two_proportion_ztest" ->
      """WITH u AS (SELECT user_id % 2 AS variant,
                           CAST(max(CASE WHEN event_type = 'purchase'
                                          AND value > 90
                                         THEN 1 ELSE 0 END) AS BIGINT)
                             AS converted
                    FROM events GROUP BY user_id),
          cells AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(converted) AS BIGINT) AS x
                    FROM u GROUP BY variant),
          a AS (SELECT n AS n1, x AS x1 FROM cells WHERE variant = 0),
          b AS (SELECT n AS n2, x AS x2 FROM cells WHERE variant = 1)
          SELECT n1, x1, n2, x2,
                 (1000000 * x1) // n1 AS cvr1_ppm,
                 (1000000 * x2) // n2 AS cvr2_ppm,
                 CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 THEN
                   (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                          * (1.0 - CAST(x1 + x2 AS DOUBLE)
                                   / CAST(n1 + n2 AS DOUBLE))
                          * (1.0 / CAST(n1 AS DOUBLE)
                             + 1.0 / CAST(n2 AS DOUBLE)))
                 END AS z
          FROM a, b""",

    "ab2_cuped" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                            CAST(round(value * 100) AS BIGINT) AS cents
                     FROM events),
          mn AS (SELECT min(day) AS mind FROM ev),
          ux AS (SELECT user_id,
                        CAST(sum(CASE WHEN day < mind + 15 THEN cents
                                      ELSE 0 END) AS BIGINT) AS x,
                        CAST(sum(CASE WHEN day >= mind + 15 THEN cents
                                      ELSE 0 END) AS BIGINT) AS y
                 FROM ev, mn GROUP BY user_id),
          m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                       sum(x * y) AS sxy, sum(y * y) AS syy
                FROM ux),
          c AS (SELECT n AS n_users,
                       CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
                       CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
                       CAST(n * syy - sy * sy AS DOUBLE) AS vary
                FROM m)
          SELECT n_users, cov / varx AS theta,
                 CAST(floor(CAST(1000000 AS DOUBLE) * (cov * cov)
                        / (varx * vary)) AS BIGINT) AS var_reduction_ppm
          FROM c""",

    // same sorted-prefix pair identity; HUGEINT stands in for Spark's
    // decimal(38,0) — both are exact integers, both round-to-nearest on
    // the single final cast to double
    "st11_gini" ->
      """WITH cells AS (
           SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(count(*) AS BIGINT) AS w
           FROM orders GROUP BY 1, 2),
         cum AS (
           SELECT prio, cents, w, CAST(cents AS HUGEINT) * w AS sw,
                  CAST(sum(w) OVER win AS BIGINT) AS cumw,
                  CAST(sum(CAST(cents AS HUGEINT) * w) OVER win AS HUGEINT)
                    AS cums
           FROM cells
           WINDOW win AS (PARTITION BY prio ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         agg AS (
           SELECT prio, CAST(sum(w) AS BIGINT) AS n,
                  CAST(sum(sw) AS HUGEINT) AS total,
                  CAST(sum(CAST(w AS HUGEINT) *
                    (CAST(cents AS HUGEINT) * (cumw - w) - (cums - sw)))
                    AS HUGEINT) AS pairs
           FROM cum GROUP BY prio)
         SELECT prio, n, CAST(total AS BIGINT) AS total_cents,
                CAST(pairs AS DOUBLE) /
                  (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) AS gini
         FROM agg ORDER BY prio""",

    "st12_kendall_tau" ->
      """WITH daily AS (
           SELECT day,
                  CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS x,
                  CAST(sum(CASE WHEN t = 'purchase' THEN cents ELSE 0 END)
                       AS BIGINT) AS y
           FROM (SELECT epoch_us(ts) // 86400000000 AS day, event_type AS t,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND value IS NOT NULL)
           GROUP BY day),
         pairs AS (
           SELECT CAST(b.x - a.x AS HUGEINT) * CAST(b.y - a.y AS HUGEINT)
                    AS prod,
                  CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
                  CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
           FROM daily a JOIN daily b ON a.day < b.day),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nc,
                  CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nd,
                  CAST(sum(tx) AS BIGINT) AS tied_x,
                  CAST(sum(ty) AS BIGINT) AS tied_y
           FROM pairs)
         SELECT n_pairs, nc, nd, tied_x, tied_y,
                CAST(nc - nd AS DOUBLE) /
                  sqrt(CAST(n_pairs - tied_x AS DOUBLE) *
                       CAST(n_pairs - tied_y AS DOUBLE)) AS tau_b
         FROM agg""",

    "st15_p_chart" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                        CAST(sum(x) AS BIGINT) AS tx FROM daily),
         m AS (
           SELECT day, n, x,
                  CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE) AS pbar,
                  sqrt((CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)) *
                       (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)) /
                       CAST(n AS DOUBLE)) AS sigma,
                  CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p
           FROM daily CROSS JOIN tot)
         SELECT day, n, x,
                CAST((1000000 * x) // n AS BIGINT) AS rate_ppm,
                CAST(CAST(pbar + 3.0 * sigma AS DECIMAL(18,6)) AS DOUBLE)
                  AS ucl,
                CAST(CAST(greatest(pbar - 3.0 * sigma, 0.0) AS DECIMAL(18,6))
                  AS DOUBLE) AS lcl,
                p > pbar + 3.0 * sigma AS above,
                p < greatest(pbar - 3.0 * sigma, 0.0) AS below,
                (p > pbar + 2.0 * sigma OR
                 p < greatest(pbar - 2.0 * sigma, 0.0)) AS warn_2s
         FROM m ORDER BY day""",
  )
}
