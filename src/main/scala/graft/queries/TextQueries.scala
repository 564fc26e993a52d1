package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableHash
import graft.ops.TextOps

/** Text-analysis pack (builder-prompt extension): language ID, quality
  * scoring, token counting, document fingerprinting — each a narrow,
  * shuffle-free map over `documents` that would fuse into the scan at
  * 100 TB. Oracle SQL is generated from the same profile/constant tables
  * as the Spark expressions, so both engines share one definition.
  */
object TextQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_langid" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextOps.langPredict(toks).as("lang_pred"))
        .orderBy("doc_id")
    }),

    "t2_quality_score" -> ((s, d) => {
      val comps = TextOps.qualityComponents(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id") +: comps.map { case (n, c) => c.as(n) }
          :+ TextOps.qualityScore(col("text")).as("quality"): _*)
        .orderBy("doc_id")
    }),

    "t3_token_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_ws_tokens"),
          TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"),
          length(col("text")).as("n_chars_computed"))
        .orderBy("doc_id")),

    "t4_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Train/test split the PRODUCTION way: deterministic content-hash
    // bucketing, not RNG — reproducible across runs/engines, stable as
    // the corpus grows, and leak-free when keyed by the dedup component.
    "t5_hash_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(pmod(StableHash.polyHash(
              concat_ws("", lit("split|"), col("doc_id").cast("string"))),
            lit(100)) < 80, "train").otherwise("test").as("split"))
        .orderBy("doc_id")),

    // Token-budget packing: docs packed into ~512-token bins per lang
    // (context-window filling). Prefix-sum over a PARTITIONED window —
    // global greedy packing would be a single-task window; per-lang (or
    // per-shard) keys keep it one keyed shuffle at any scale.
    "t6_token_packing" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id", expr("(cum - n_tokens) DIV 512"))
        .select("doc_id", "lang", "n_tokens", "pack_id")
        .orderBy("doc_id")
    }),
  )

  private def langidSql: String = {
    val scores = TextOps.langProfiles.map { case (l, p) =>
      val set = p.map(x => s"'$x'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(ts, t -> list_contains($set, t))) AS DOUBLE) / " +
        s"CAST(len(ts) AS DOUBLE) AS s_$l"
    }.mkString(",\n                 ")
    val g = TextOps.langProfiles.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val cases = TextOps.langProfiles.map { case (l, _) =>
      s"WHEN s_$l = g THEN '$l'"
    }.mkString(" ")
    s"""WITH x AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
        s AS (SELECT doc_id, lang, $scores FROM x),
        m AS (SELECT *, $g AS g FROM s)
        SELECT doc_id, lang, CASE $cases END AS lang_pred
        FROM m ORDER BY doc_id"""
  }

  private def qualitySql: String =
    s"""WITH x AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
        c AS (SELECT doc_id,
                CAST(len(ts) AS INT) AS n_tokens,
                CAST(len(list_distinct(ts)) AS INT) AS n_distinct,
                CAST(len(list_distinct(ts)) AS DOUBLE) / CAST(len(ts) AS DOUBLE)
                  AS diversity,
                CAST(length(text) - (len(ts) - 1) AS DOUBLE) / CAST(len(ts) AS DOUBLE)
                  AS mean_token_len,
                CAST(len(list_filter(ts, t -> list_contains(['the','a','and','of'], t)))
                     AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS stopword_ratio
              FROM x)
        SELECT doc_id, n_tokens, n_distinct, diversity, mean_token_len, stopword_ratio,
               diversity * 0.6 + (1.0 - stopword_ratio) * 0.3
                 + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.1 AS quality
        FROM c ORDER BY doc_id"""

  val oracles: Map[String, String] = Map(
    "t5_hash_split" ->
      s"""SELECT doc_id,
                 CASE WHEN ${StableHash.polyHashSql(
        "concat('split|', CAST(doc_id AS VARCHAR))")} % 100 < 80
                      THEN 'train' ELSE 'test' END AS split
          FROM documents ORDER BY doc_id""",
    "t6_token_packing" ->
      """WITH x AS (SELECT doc_id, lang,
                           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
                    FROM documents),
          c AS (SELECT doc_id, lang, n_tokens,
                       CAST(sum(n_tokens) OVER (PARTITION BY lang
                                                ORDER BY doc_id) AS BIGINT) AS cum
                FROM x)
          SELECT doc_id, lang, n_tokens, (cum - n_tokens) // 512 AS pack_id
          FROM c ORDER BY doc_id""",
    "t1_langid" -> langidSql,
    "t2_quality_score" -> qualitySql,
    "t3_token_counts" ->
      s"""SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
                 CAST(len(regexp_extract_all(text, '${TextOps.bpeTokenPattern}')) AS INT)
                   AS n_bpe_tokens,
                 CAST(length(text) AS INT) AS n_chars_computed
          FROM documents ORDER BY doc_id""",
    "t4_fingerprint" ->
      s"""SELECT doc_id, ${StableHash.polyHashSql("text")} AS fp
          FROM documents ORDER BY doc_id""",
  )
}
