package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableHash

/** Cardinality / set-overlap sketches with exact calibration readouts —
  * the distinct-counting tier of the sketch family (hh1/hh2 cover
  * frequency). Spark's own `approx_count_distinct` (HLL++) and DuckDB's
  * `approx_count_distinct` are different implementations with different
  * hash functions, so neither can oracle the other; these queries instead
  * implement the sketches PORTABLY on the [[StableHash.polyHash64]] family
  * — every register / minimum is integer arithmetic both engines evaluate
  * identically, so even the *approximation* is hash-gated exactly, and the
  * calibration columns (estimate vs exact, error ppm) are the readout a
  * production pipeline monitors.
  *
  * Scale discipline (the hh2 rule): a sketch query's only data-scale work
  * is ONE keyed aggregate to a BOUNDED cell domain — (day × m registers)
  * for HLL, (day × k minima) for bottom-k — regardless of cardinality.
  * State per group is O(m) / O(k); map-side combine ships cells, not rows.
  *
  * Hash plumbing shared by all three: `polyHash64('u' || user_id)` packs
  * two independent residues (h mod P, h mod P2) into one BIGINT; the pair
  * is split back out and QUADRATICALLY spread, (h² mod p + a·h + b) mod p.
  * The affine-only spread (the StatsQueries/t20 rule) is NOT enough here,
  * measured: sequential ids give near-arithmetic polyHash values (the
  * last char drives ±1 steps), and an affine map of an arithmetic
  * sequence is again arithmetic — mod 256 it becomes a fixed-stride
  * lattice that UNDERFILLS register collisions (121 used / expected 104
  * at D=134), biasing HLL +22%; and raw short-id hashes never wrap mod P
  * (\"u149\" folds to ~3.6e6 ≪ P), so KMV minima sit 250× too low and the
  * estimator reads 2000× high. The h² term makes consecutive inputs'
  * differences 2h+1+a — hp-dependent, no lattice — restoring binomial
  * register fill (HLL err 1.7%, KMV err 3% at D=134, measured).
  */
object SketchQueries extends QueryPack {

  private val DAY_NS = 24L * 3600 * 1000 * 1000 * 1000
  private val DAY_US = DAY_NS / 1000
  private val P = StableHash.P
  private val P2 = StableHash.P2

  // HLL core (register count, rho width, alpha, spread params) lives in
  // [[graft.functions.Hll]] — ONE definition shared with the streaming
  // twin (StreamOps.approxDistinct) and interpolated into the oracle SQL,
  // so batch query, oracle, and stream can never drift apart.
  import graft.functions.Hll.{M, W, SentBit, MaxTerm, Alpha => Alpha256,
    RA => rA, RB => rB, VA => vA, VB => vB}
  /** Bottom-k sizes: sk1's estimator needs the k-th minimum to exist
    * (days with < k distinct users drop out — at sf0.01 every day has
    * ~130 >> 32); sk2's Jaccard resolution is 1/k.
    */
  private val K1 = 32
  private val K2 = 64

  /** (day, q1, q2): the two quadratically-spread residues of each event's
    * user hash. hp = h div 2^31 ∈ [0,P), hp2 = h mod 2^31 ∈ [0,P2); the
    * spread keeps every intermediate < 2·10^18 (h² mod p ≤ 10^9·10^9
    * reduced first, then one a·h product ≤ 10^18) — BIGINT-safe on both
    * engines.
    */
  private def spread(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      expr(s"ts DIV $DAY_NS").as("day"),
      StableHash.polyHash64(concat(lit("u"), col("user_id").cast("string")))
        .as("h"))
      .select(col("day"),
        expr("h DIV 2147483648").as("hp"), expr("h % 2147483648").as("hp2"))
      .select(col("day"),
        expr(s"(hp * hp % $P + $rA * hp + $rB) % $P").as("q1"),
        expr(s"(hp2 * hp2 % $P2 + $vA * hp2 + $vB) % $P2").as("q2"))

  private def spreadSql: String =
    s"""SELECT day,
               (hp * hp % $P + $rA * hp + $rB) % $P AS q1,
               (hp2 * hp2 % $P2 + $vA * hp2 + $vB) % $P2 AS q2
        FROM (SELECT epoch_us(ts) // $DAY_US AS day,
                     h // 2147483648 AS hp, h % 2147483648 AS hp2
              FROM (SELECT ts,
                      ${StableHash.polyHash64Sql("('u' || CAST(user_id AS VARCHAR))")} AS h
                    FROM events))"""

  /** Uniformized 60-bit point u = q1·P2 + q2 ∈ [0, P·P2), uniform because
    * (q1, q2) → u is a bijection of the residue pair onto a dense range —
    * unlike the packed `polyHash64` value itself, whose 2^31 blocks are
    * only [0,P2)-filled, so rank statistics (KMV) on it would be biased.
    */
  private def uniformPoints(s: SparkSession, d: String): DataFrame =
    spread(s, d).select(col("day"),
      (col("q1") * lit(P2) + col("q2")).as("u")).distinct()

  private def uniformSql: String =
    s"""SELECT DISTINCT day, q1 * $P2 + q2 AS u FROM ($spreadSql)"""

  /** The exact double expression both engines evaluate for the KMV
    * estimator (k−1)·|domain| / u_k — all factors exact-in-double or one
    * correctly-rounded op, identical association on both sides.
    */
  private def kmvEstCol(uk: String) =
    lit((K1 - 1).toDouble) * lit(P.toDouble) * lit(P2.toDouble) /
      col(uk).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Portable HyperLogLog, per-day distinct users, calibrated against the
    // exact count. Register j = affine(hp) mod 256; rho = 1 + trailing
    // zeros of affine(hp2)'s low 20 bits, computed WITHOUT log2 (length of
    // bin(lowest set bit) — log2(2^k) is not guaranteed exactly k on
    // either engine's libm, bin() is integer-exact on both). The scaled
    // harmonic sum Σ 2^(21−rho_j) stays integral, so the only double ops
    // are the final alpha·m²·2^21/S divide and — in the small-range regime
    // raw ≤ 2.5m with empty registers — linear counting m·(ln m − ln V),
    // ln of exact ints (the t19 rule; here it is intrinsic to the
    // algorithm, not a constant to precompute: V is data-dependent).
    "hll1_distinct_calibration" -> ((s, d) => {
      val reg = spread(s, d).select(col("day"),
          expr(s"q1 % $M").as("reg"),
          expr(s"q2 % $SentBit + $SentBit").as("vv"))
        .withColumn("rho", length(bin(expr("vv & -vv"))))
        .groupBy("day", "reg").agg(max(col("rho")).as("mr"))
      val cells = reg.groupBy("day").agg(
          sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${W + 1} - mr)")).as("sp"),
          count(lit(1)).as("used"))
        .select(col("day"), col("used"),
          (lit(M.toLong) - col("used")).as("zeros"),
          (col("sp") + (lit(M.toLong) - col("used")) * lit(MaxTerm))
            .as("ssum"))
      val exact = Tables.events(s, d)
        .select(expr(s"ts DIV $DAY_NS").as("day"), col("user_id"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("n_exact"))
      cells.join(exact, "day")
        .withColumn("raw_est",
          lit(Alpha256) * lit((M.toLong * M).toDouble) * lit(MaxTerm.toDouble)
            / col("ssum").cast("double"))
        .withColumn("est",
          when(col("zeros") > 0 && col("raw_est") <= lit(2.5 * M),
            lit(M.toDouble) *
              (log(lit(M.toDouble)) - log(col("zeros").cast("double"))))
          .otherwise(col("raw_est")))
        .withColumn("err_ppm",
          floor(lit(1000000.0) * abs(col("est") - col("n_exact").cast("double"))
            / col("n_exact").cast("double")).cast("bigint"))
        .select("day", "n_exact", "used", "zeros", "est", "err_ppm")
        .orderBy("day")
    }),

    // Bottom-k (KMV) distinct estimator, per day: the k-th smallest of the
    // uniformized user hashes estimates D ≈ (k−1)·|domain|/u_k. The k
    // minima ride a hard-O(k) TopKAggregator buffer (gt5's SmallestLongs)
    // — map-side combine ships ≤k values per (day, partition); the
    // row_number window spelling would sort every day's rows. Days with
    // fewer than k distinct users have no k-th minimum and drop out (none
    // at sf≥0.01).
    "sk1_bottomk_distinct" -> ((s, d) => {
      import s.implicits._
      val du = uniformPoints(s, d)
      val agg = new graft.functions.TopKAggregator.SmallestLongs(K1)
      val kth = du.as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
        .agg(agg.toColumn).toDF("day", "bot")
        .filter(size(col("bot")) === K1)
        .select(col("day"), element_at(col("bot"), K1).as("uk"))
      val exact = du.groupBy("day").agg(count(lit(1)).as("n_exact"))
      kth.join(exact, "day")
        .withColumn("est", kmvEstCol("uk"))
        .withColumn("err_ppm",
          floor(lit(1000000.0) * abs(col("est") - col("n_exact").cast("double"))
            / col("n_exact").cast("double")).cast("bigint"))
        .select("day", "n_exact", "uk", "est", "err_ppm")
        .orderBy("day")
    }),

    // K-minimum-values Jaccard between consecutive days' user sets,
    // calibrated against the exact overlap — the streaming-friendly "how
    // similar is today's audience to yesterday's" readout. The k smallest
    // hashes of the UNION form an unbiased sample of it; the fraction
    // also present in both sides estimates J. Flags ride the minima by
    // encoding (u·4 + in_a·2 + in_b) into one long — same order as u, so
    // SmallestLongs needs no second pass — and every output column is an
    // integer ppm: the whole query is exact-arithmetic end to end.
    "sk2_bottomk_jaccard" -> ((s, d) => {
      import s.implicits._
      val du = uniformPoints(s, d)
      val days = du.select("day").distinct()
      val valid = days.select(col("day").as("p"))
        .join(days.select((col("day") - 1).as("p")), Seq("p"))
      val uni = du.select(col("day").as("p"), col("u"),
          lit(1L).as("a"), lit(0L).as("b"))
        .unionAll(du.select((col("day") - 1).as("p"), col("u"),
          lit(0L).as("a"), lit(1L).as("b")))
        .join(valid, Seq("p"))
        .groupBy("p", "u").agg(max(col("a")).as("a"), max(col("b")).as("b"))
      val exact = uni.groupBy("p").agg(count(lit(1)).as("n_union"),
        sum(col("a") * col("b")).as("n_inter"))
      val agg = new graft.functions.TopKAggregator.SmallestLongs(K2)
      val kmv = uni.select(col("p"),
          (col("u") * 4 + col("a") * 2 + col("b")).as("e"))
        .as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
        .agg(agg.toColumn).toDF("p", "bot")
        .select(col("p"), size(col("bot")).cast("bigint").as("k_used"),
          expr("CAST(size(filter(bot, x -> x % 4 = 3)) AS BIGINT)")
            .as("both_in_k"))
      exact.join(kmv, "p")
        .select(col("p").as("day_a"), (col("p") + 1).as("day_b"),
          col("n_union"), col("n_inter"),
          expr("(1000000 * n_inter) div n_union").as("j_exact_ppm"),
          col("k_used"), col("both_in_k"),
          expr("(1000000 * both_in_k) div k_used").as("j_est_ppm"))
        .orderBy("day_a")
    }))

  val oracles: Map[String, String] = Map(
    "hll1_distinct_calibration" ->
      s"""WITH res AS ($spreadSql),
          vv AS (SELECT day, q1 % $M AS reg,
                        q2 % $SentBit + $SentBit AS vv
                 FROM res),
          regs AS (SELECT day, reg,
                          CAST(max(length(bin(vv & -vv))) AS INT) AS mr
                   FROM vv GROUP BY day, reg),
          cells AS (SELECT day,
                           CAST(sum(CAST(1 AS BIGINT) << (${W + 1} - mr))
                             AS BIGINT) AS sp,
                           CAST(count(*) AS BIGINT) AS used
                    FROM regs GROUP BY day),
          st AS (SELECT day, used, $M - used AS zeros,
                        sp + ($M - used) * $MaxTerm AS ssum
                 FROM cells),
          ex AS (SELECT epoch_us(ts) // $DAY_US AS day,
                        CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
                 FROM events GROUP BY 1),
          est AS (SELECT day, n_exact, used, zeros,
                         CAST($Alpha256 AS DOUBLE) * CAST(${M.toLong * M} AS DOUBLE)
                           * CAST($MaxTerm AS DOUBLE) / CAST(ssum AS DOUBLE)
                           AS raw_est
                  FROM st JOIN ex USING (day)),
          fin AS (SELECT day, n_exact, used, zeros,
                         CASE WHEN zeros > 0 AND raw_est <= ${2.5 * M}
                              THEN CAST($M AS DOUBLE)
                                   * (ln(CAST($M AS DOUBLE))
                                      - ln(CAST(zeros AS DOUBLE)))
                              ELSE raw_est END AS est
                  FROM est)
          SELECT day, n_exact, used, zeros, est,
                 CAST(floor(CAST(1000000 AS DOUBLE)
                        * abs(est - CAST(n_exact AS DOUBLE))
                        / CAST(n_exact AS DOUBLE)) AS BIGINT) AS err_ppm
          FROM fin ORDER BY day""",

    "sk1_bottomk_distinct" ->
      s"""WITH du AS ($uniformSql),
          rk AS (SELECT day, u,
                        row_number() OVER (PARTITION BY day ORDER BY u) AS rn
                 FROM du),
          kth AS (SELECT day, u AS uk FROM rk WHERE rn = $K1),
          ex AS (SELECT day, CAST(count(*) AS BIGINT) AS n_exact
                 FROM du GROUP BY day),
          est AS (SELECT day, n_exact, uk,
                         CAST(${K1 - 1} AS DOUBLE) * CAST($P AS DOUBLE)
                           * CAST($P2 AS DOUBLE) / CAST(uk AS DOUBLE) AS est
                  FROM kth JOIN ex USING (day))
          SELECT day, n_exact, uk, est,
                 CAST(floor(CAST(1000000 AS DOUBLE)
                        * abs(est - CAST(n_exact AS DOUBLE))
                        / CAST(n_exact AS DOUBLE)) AS BIGINT) AS err_ppm
          FROM est ORDER BY day""",

    "sk2_bottomk_jaccard" ->
      s"""WITH du AS ($uniformSql),
          days AS (SELECT DISTINCT day FROM du),
          valid AS (SELECT d1.day AS p FROM days d1
                    JOIN days d2 ON d2.day = d1.day + 1),
          pairs AS (SELECT day AS p, u, 1 AS a, 0 AS b FROM du
                    UNION ALL
                    SELECT day - 1 AS p, u, 0 AS a, 1 AS b FROM du),
          uni AS (SELECT p, u, CAST(max(a) AS BIGINT) AS a,
                         CAST(max(b) AS BIGINT) AS b
                  FROM pairs JOIN valid USING (p) GROUP BY p, u),
          ex AS (SELECT p, CAST(count(*) AS BIGINT) AS n_union,
                        CAST(sum(a * b) AS BIGINT) AS n_inter
                 FROM uni GROUP BY p),
          rk AS (SELECT p, a, b,
                        row_number() OVER (PARTITION BY p ORDER BY u) AS rn
                 FROM uni),
          kb AS (SELECT p, CAST(count(*) AS BIGINT) AS k_used,
                        CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS both_in_k
                 FROM rk WHERE rn <= $K2 GROUP BY p)
          SELECT p AS day_a, p + 1 AS day_b, n_union, n_inter,
                 (1000000 * n_inter) // n_union AS j_exact_ppm,
                 k_used, both_in_k,
                 (1000000 * both_in_k) // k_used AS j_est_ppm
          FROM ex JOIN kb USING (p) ORDER BY day_a""")
}
