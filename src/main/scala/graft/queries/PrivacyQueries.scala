package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableHash

/** Privacy-preserving release operators: k-anonymity audit, l-diversity
  * audit, and the generalization APPLY that suppresses quasi-identifiers
  * in re-identifiable groups.
  *
  * A training-data pipeline that exports user-derived tables runs exactly
  * these three before release (t7_pii_redact handles free text; this pack
  * handles the structured side): is any quasi-identifier combination rare
  * enough to single someone out (k), does any group leak its sensitive
  * attribute by uniformity (l), and what does the table look like with the
  * offending cells generalized away.
  *
  * Scale shape, all three: the quasi-identifier GROUP table is bounded by
  * the QI domain (nation × segment × balance-bucket ≈ 1.4k cells), never
  * by data — so the audit is ONE keyed aggregate, and the apply is one
  * BROADCAST join of that tiny cell table back onto the fact scan. No
  * window, no self-join, nothing grows with row count. Exactness: group
  * sizes and distinct counts are integers; the only double op is one
  * floor(x/1000) per row — a fixed IEEE tree both engines.
  */
object PrivacyQueries extends QueryPack {

  private val K = 4 // groups smaller than this are re-identifiable
  private val L = 3 // groups with fewer distinct sensitive values leak

  // pv4's seeded uniform: the t20/st1 affine-rehash discipline
  private val (sA, sB) = StableHash.affineParams(1).head

  /** Quasi-identifier projection shared by pv1 and pv3: nation key,
    * market segment, account balance generalized to a $1000 bucket. */
  private def qi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
      col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / lit(1000.0)).cast("bigint").as("bal_bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // k-anonymity AUDIT: every QI equivalence class with its size and a
    // violation flag. The release gate a privacy review reads is the
    // violating-row total, so it rides along per group.
    "pv1_k_anonymity" -> ((s, d) =>
      qi(s, d)
        .groupBy("c_nationkey", "seg", "bal_bucket")
        .agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("seg"), col("bal_bucket"), col("n"),
          (col("n") < K).cast("boolean").as("violates_k"))
        .orderBy("c_nationkey", "seg", "bal_bucket")),

    // l-diversity AUDIT on the order fact: QI = (status, priority, order
    // month); sensitive attribute = which customer placed the order. A
    // group whose orders all belong to few customers re-identifies them
    // even when the group itself is large — k-anonymity alone misses
    // this. Exact distinct (Spark's two-phase partial agg) per
    // domain-bounded group.
    "pv2_l_diversity" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"),
          (year(col("o_orderdate").cast("timestamp")) * 100 +
            month(col("o_orderdate").cast("timestamp")))
            .cast("bigint").as("ym"),
          col("o_custkey"))
        .groupBy("status", "prio", "ym")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_sensitive"))
        .select(col("status"), col("prio"), col("ym"), col("n"),
          col("n_sensitive"),
          (col("n_sensitive") < L).cast("boolean").as("violates_l"))
        .orderBy("status", "prio", "ym")),

    // Generalization APPLY: rows in k-violating QI groups get their
    // segment suppressed to '*' and their balance bucket to NULL — one
    // ladder step, the standard Mondrian-style local recoding. The
    // violating-group list is QI-domain-bounded → broadcast; the fact
    // scan is joined once and never shuffled.
    "pv3_generalize" -> ((s, d) => {
      val rows = qi(s, d)
      val bad = rows.groupBy("c_nationkey", "seg", "bal_bucket")
        .agg(count(lit(1)).as("n")).filter(col("n") < K)
        .select(col("c_nationkey").as("vn"), col("seg").as("vs"),
          col("bal_bucket").as("vb"))
      rows.join(broadcast(bad),
          col("c_nationkey") === col("vn") && col("seg") === col("vs") &&
            col("bal_bucket") === col("vb"), "left")
        .select(col("c_custkey"), col("c_nationkey"),
          when(col("vn").isNull, col("seg")).otherwise(lit("*")).as("seg_out"),
          when(col("vn").isNull, col("bal_bucket")).as("bal_bucket_out"))
        .orderBy("c_custkey")
    }),

    // Differentially-private release of group counts: count(nation ×
    // segment) + Laplace(1/ε) noise via the inverse CDF,
    //   noise = −b · sign(u−½) · ln(1 − 2|u−½|),  b = 1/ε = 1.
    // The uniform is the f12b/t20 DETERMINISTIC twin discipline: a
    // seeded affine-rehashed polyHash of the group key, so the gate is
    // exact and a re-run releases the same table (production swaps in a
    // true RNG — one seed column is the only change; determinism is
    // what makes the operator testable, and re-releasing fresh noise on
    // every query would burn privacy budget anyway). u is a rational in
    // (0,1) with |u−½| < ½ strictly, so the ln argument is always
    // positive; ln is correctly rounded both engines (t19's rule), the
    // whole noise term is one fixed IEEE tree per group.
    "pv4_dp_noisy_count" -> ((s, d) => {
      val u = ((StableHash.polyHash(concat_ws("", lit("dp|"),
        col("c_nationkey").cast("string"), lit("|"), col("seg")))
        * lit(sA) + lit(sB)) % lit(StableHash.P) + 1.0)
        .cast("double") / lit((StableHash.P + 1).toDouble)
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment").as("seg"))
        .groupBy("c_nationkey", "seg")
        .agg(count(lit(1)).as("n_true"))
        .select(col("c_nationkey"), col("seg"),
          // decimal-pinned (w7's rule): the two libms' ln agree to ~1 ulp
          // but not bit-for-bit on full-width arguments; 6 decimals is
          // far above the drift and far below the noise scale
          (col("n_true").cast("double") -
            signum(u - lit(0.5)) *
              log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))))
            .cast("decimal(18,6)").cast("double")
            .as("noisy_count"))
        .orderBy("c_nationkey", "seg")
    }),
  )

  val oracles: Map[String, String] = Map(
    "pv1_k_anonymity" ->
      s"""SELECT c_nationkey, seg, bal_bucket, n, n < $K AS violates_k
          FROM (SELECT c_nationkey, c_mktsegment AS seg,
                       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                       CAST(count(*) AS BIGINT) AS n
                FROM customer GROUP BY 1, 2, 3)
          ORDER BY c_nationkey, seg, bal_bucket""",

    "pv2_l_diversity" ->
      s"""SELECT status, prio, ym, n, n_sensitive,
                 n_sensitive < $L AS violates_l
          FROM (SELECT o_orderstatus AS status, o_orderpriority AS prio,
                       CAST(EXTRACT(year FROM o_orderdate) * 100 +
                            EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_sensitive
                FROM orders GROUP BY 1, 2, 3)
          ORDER BY status, prio, ym""",

    "pv3_generalize" ->
      s"""WITH rows_q AS (
            SELECT c_custkey, c_nationkey, c_mktsegment AS seg,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
            FROM customer),
          bad AS (
            SELECT c_nationkey AS vn, seg AS vs, bal_bucket AS vb
            FROM rows_q GROUP BY 1, 2, 3 HAVING count(*) < $K)
          SELECT r.c_custkey, r.c_nationkey,
                 CASE WHEN b.vn IS NULL THEN r.seg ELSE '*' END AS seg_out,
                 CASE WHEN b.vn IS NULL THEN r.bal_bucket END AS bal_bucket_out
          FROM rows_q r LEFT JOIN bad b
            ON r.c_nationkey = b.vn AND r.seg = b.vs AND r.bal_bucket = b.vb
          ORDER BY r.c_custkey""",

    // same seeded uniform, same inverse-CDF tree
    "pv4_dp_noisy_count" -> {
      val uSql = s"""((${StableHash.polyHashSql(
        "concat('dp|', CAST(c_nationkey AS VARCHAR), '|', seg)")}
          * $sA + $sB) % ${StableHash.P} + 1.0) / ${StableHash.P + 1}.0"""
      s"""SELECT c_nationkey, seg,
                 CAST(CAST(CAST(n_true AS DOUBLE)
                   - sign(($uSql) - 0.5)
                     * ln(1.0 - 2.0 * abs(($uSql) - 0.5))
                   AS DECIMAL(18,6)) AS DOUBLE) AS noisy_count
          FROM (SELECT c_nationkey, c_mktsegment AS seg,
                       CAST(count(*) AS BIGINT) AS n_true
                FROM customer GROUP BY 1, 2)
          ORDER BY c_nationkey, seg"""
    },
  )
}
