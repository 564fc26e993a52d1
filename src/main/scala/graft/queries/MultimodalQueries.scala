package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableHash
import graft.multimodal.MediaOps
import graft.multimodal.MediaOps.MediaRow

/** Multimodal pack: binary payload + typed metadata columns built from the
  * corpus, decoded through the batch-shaped partition operator (stub
  * decoder — deterministic, so even the decode output is oracle-checkable:
  * for ASCII payloads the byte-fold hash equals the text rolling hash).
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_decode_features" -> ((s, d) => {
      import s.implicits._
      val media = MediaOps.mediaFromDocuments(Tables.documents(s, d)).as[MediaRow]
      MediaOps.decodeFeatures(s, media)
        .toDF()
        .select(col("media_id"), col("n_bytes"),
          element_at(col("feature"), 1).as("f0"),
          element_at(col("feature"), 2).as("f1"))
        .orderBy("media_id")
    }),

    "mm2_frame_sample" -> ((s, d) =>
      MediaOps.mediaFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("meta.kind").as("kind"),
          size(MediaOps.sampleFrameIndices(col("meta"), 3)).as("n_sampled"))
        .orderBy("media_id")),

    "mm3_resize_meta" -> ((s, d) =>
      MediaOps.withResizedMeta(
          MediaOps.mediaFromDocuments(Tables.documents(s, d)), 64, 48)
        .select(col("media_id"), col("meta.kind").as("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.nFrames").as("n_frames"))
        .orderBy("media_id")),

    // Content-addressed asset dedup — the exact-dedup tier for OPAQUE
    // binary payloads (images/audio shipped byte-identical by mirrors and
    // re-crawls; no decode needed). The digest is computed in the scan
    // projection, so at 100 TB only (32-byte sha, id) pairs ride the one
    // keyed shuffle — the payload bytes themselves never leave the scan.
    // Canonical survivor = minimum media id, with an absorbed-copy audit
    // count (d8 discipline, applied to media). The corpus has no
    // byte-identical payloads, so docs with doc_id % 9 == 0 become one of
    // three constant "mirrored asset" blobs (deterministic, row-local) —
    // the absorb path provably fires, same rationale as t7's PII seeds
    // and d12's corrupted twins.
    "mm4_media_exact_dedup" -> ((s, d) => {
      val seeded = when(col("doc_id") % 9 === 0,
        concat(lit("MIRROR ASSET "),
          ((col("doc_id") % 27) / lit(9)).cast("int").cast("string")))
        .otherwise(col("text"))
      MediaOps.mediaFromDocuments(
          Tables.documents(s, d).withColumn("text", seeded))
        .select(col("media_id"), sha2(col("payload"), 256).as("content_sha"))
        .groupBy("content_sha")
        .agg(min(col("media_id")).as("media_id"),
          count(lit(1)).cast("int").as("n_copies"))
        .select("media_id", "content_sha", "n_copies")
        .orderBy("media_id")
    }),
    // Shard packing for training export (the webdataset/tar-shard
    // manifest): assign each asset, per modality, to a fixed-byte-budget
    // shard by running payload size, and emit the per-shard manifest
    // (asset count, bytes, id range) the downstream loader reads. t6's
    // running-sum packing discipline applied to BYTES of opaque payloads
    // — but aggregated to the shard manifest, which is what an export
    // coordinator actually schedules on. Scale: one kind-keyed window
    // (running sum over the asset stream, no global sort) + one
    // map-side-combined aggregate to O(shards) rows; payload bytes never
    // shuffle — only (id, kind, length) rides the exchange, the mm4
    // projection discipline.
    "mm5_shard_pack" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("kind").orderBy("media_id")
      MediaOps.mediaFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("meta.kind").as("kind"),
          length(col("payload")).as("n_bytes"))
        .withColumn("cum", sum(col("n_bytes")).over(w))
        .withColumn("shard_id", expr("(cum - n_bytes) DIV 8192"))
        .groupBy("kind", "shard_id")
        .agg(count(lit(1)).cast("int").as("n_assets"),
          sum(col("n_bytes")).as("shard_bytes"),
          min(col("media_id")).as("first_asset"),
          max(col("media_id")).as("last_asset"))
        .orderBy("kind", "shard_id")
    }),

    // Perceptual-style NEAR-dup over media payloads — the companion to
    // mm4's byte-identical tier: a re-encoded/retouched asset (here: a
    // one-byte retouch injected for media_id % 11 == 0, d12's twin
    // discipline) hashes to a NEARBY 64-bit signature, caught by banded
    // hamming ≤ 3. The signature is computed on the DECODED payload
    // (binary → features seam; the stub "feature extraction" is the
    // payload's token shingles — a real pHash drops in behind the same
    // decode step without touching the plan). Scale shape is d13's:
    // signature in the scan projection, 4 × 16-bit band keys ride the one
    // keyed self-join, payload bytes never shuffle.
    "mm6_payload_neardup" -> ((s, d) => {
      val media = MediaOps.mediaFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), decode(col("payload"), "UTF-8").as("txt"))
      val variants = media.filter(col("media_id") % 11 === 0)
        .select((col("media_id") + lit(2000000000L)).as("media_id"),
          concat(substring(col("txt"), 1, 40), lit("q"),
            substring(col("txt"), 42, 1000000)).as("txt"))
      graft.ops.Dedup.simhash64BandPairs(media.unionByName(variants),
          "media_id", col("txt"), bandsPerLane = 2, maxHamming = 3)
        .orderBy("id1", "id2")
    }),
  )

  // d13's oracle program over the media corpus + retouched twins: the
  // payload is the UTF-8 encoding of the text, so the DuckDB side
  // fingerprints the same bytes via the text column directly
  private def mm6Sql: String = {
    val corpus =
      """(SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 2000000000,
                 substring(text, 1, 40) || 'q' || substring(text, 42)
          FROM documents WHERE doc_id % 11 = 0)"""
    val share = (0 until 2).flatMap { b =>
      Seq(s"(((a.sim_lo >> ${b * 16}) & 65535) = ((b.sim_lo >> ${b * 16}) & 65535))",
          s"(((a.sim_hi >> ${b * 16}) & 65535) = ((b.sim_hi >> ${b * 16}) & 65535))")
    }.mkString(" OR ")
    s"""${graft.ops.Dedup.simhash64CteSql(corpus, "doc_id", "text")}
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               CAST(bit_count(xor(a.sim_hi, b.sim_hi)) +
                    bit_count(xor(a.sim_lo, b.sim_lo)) AS INT) AS hamming
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE ($share)
          AND bit_count(xor(a.sim_hi, b.sim_hi)) +
              bit_count(xor(a.sim_lo, b.sim_lo)) <= 3
        ORDER BY id1, id2"""
  }

  val oracles: Map[String, String] = Map(
    "mm6_payload_neardup" -> mm6Sql,
    // FakeDecoder feature j = toFloat(((h·(j+1) + j·7919) mod 1000)) / 1000f
    // with h = byte-fold == char-fold for ASCII text.
    "mm1_decode_features" -> {
      val h = StableHash.polyHashSql("text")
      def f(j: Int) =
        s"CAST(CAST((($h * ${j + 1} + ${j * 7919}) % 1000) AS FLOAT) " +
          s"/ CAST(1000 AS FLOAT) AS DOUBLE)"
      s"""SELECT doc_id AS media_id, CAST(length(text) AS INT) AS n_bytes,
                 ${f(0)} AS f0, ${f(1)} AS f1
          FROM documents ORDER BY media_id"""
    },
    "mm2_frame_sample" ->
      """SELECT doc_id AS media_id,
                CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                CAST((n_chars % 30) // 3 + 1 AS INT) AS n_sampled
         FROM documents ORDER BY media_id""",
    "mm3_resize_meta" ->
      """SELECT doc_id AS media_id,
                CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                CAST(64 AS INT) AS width, CAST(48 AS INT) AS height,
                CAST(n_chars % 30 + 1 AS INT) AS n_frames
         FROM documents ORDER BY media_id""",
    // payload = UTF-8 bytes of text, and DuckDB's sha256 digests the
    // string's UTF-8 bytes — identical hex on both engines
    "mm4_media_exact_dedup" ->
      """WITH p AS (SELECT doc_id,
                 CASE WHEN doc_id % 9 = 0
                      THEN concat('MIRROR ASSET ',
                                  CAST((doc_id % 27) // 9 AS VARCHAR))
                      ELSE text END AS payload
              FROM documents)
         SELECT min(doc_id) AS media_id, sha256(payload) AS content_sha,
                CAST(count(*) AS INT) AS n_copies
         FROM p GROUP BY sha256(payload) ORDER BY media_id""",
    // payload bytes = UTF-8 of text (ASCII corpus), so length(text) is
    // the byte size on both engines — the mm1 byte-fold precedent.
    "mm5_shard_pack" ->
      """WITH m AS (SELECT doc_id AS media_id,
                           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                           length(text) AS n_bytes
                    FROM documents),
         c AS (SELECT media_id, kind, n_bytes,
                      sum(n_bytes) OVER (PARTITION BY kind
                                         ORDER BY media_id) AS cum
               FROM m)
         SELECT kind, CAST((cum - n_bytes) // 8192 AS BIGINT) AS shard_id,
                CAST(count(*) AS INT) AS n_assets,
                CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
                min(media_id) AS first_asset, max(media_id) AS last_asset
         FROM c GROUP BY kind, shard_id
         ORDER BY kind, shard_id""",
  )
}
