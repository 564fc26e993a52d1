package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Compiled training-data pipeline — the text-side analog of the domain
  * screening cascade (M5, `graft.domain.Predict.cascade`): Gopher rule
  * filter → content-fingerprint dedup → per-source quota → deterministic
  * shuffle-shard, composed into ONE declarative plan. Per-stage
  * cardinalities ride `observe()` metrics (`tp_00_input` … `tp_04_shard`),
  * collected by the same [[graft.domain.Pipeline.Ledger]] listener during
  * the single final action — provenance costs no extra job, the A1/A10
  * discipline.
  *
  * Scale shape: stages 1–2 are narrow maps + one fingerprint shuffle;
  * stages 3–4 are bounded windows (per-source, per-shard) — nothing sorts
  * globally, nothing collects to the driver.
  */
object TextPipeline {

  case class Config(capPerSource: Int = 10, nShards: Int = 8, bits: Int = 32)

  def compile(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // stage 4: deterministic shard + within-shard position (t13 semantics)
    val quota = upToQuota(docs, cfg)
    val h = StableHash.polyHash(
      concat_ws("", lit("shuffle|"), col("doc_id").cast("string")))
    val ws = Window.partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    quota.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(cfg.nShards)).cast("int"))
      .withColumn("pos", row_number().over(ws))
      .select(col("doc_id"), col("source"), col("simhash"), col("shard"), col("pos"))
      .observe("tp_04_shard", count(lit(1)))
  }

  /** [[compile]] with a MIXTURE stage between quota and shard: each
    * surviving doc is replicated per its source's epoch weight (t14
    * semantics — narrow explode, output = Σ weights), and the shard key
    * becomes (doc_id, epoch) so a doc's epochs spread across shards. The
    * full shape of a training-data run: filter → dedup → quota → upsample
    * → shuffle, still ONE declarative plan with a per-stage ledger.
    */
  def compileWithMixture(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val mixed = upToQuota(docs, cfg)
      .withColumn("weight",
        regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 4 + 1)
      .withColumn("epoch", explode(sequence(lit(0), col("weight") - 1)))
      .observe("tp_04_mix", count(lit(1)))
    val h = StableHash.polyHash(concat_ws("", lit("shuffle|"),
      col("doc_id").cast("string"), lit("|"), col("epoch").cast("string")))
    val ws = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col("doc_id"), col("epoch"))
    mixed.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(cfg.nShards)).cast("int"))
      .withColumn("pos", row_number().over(ws))
      .select(col("doc_id"), col("source"), col("epoch"), col("shard"), col("pos"))
      .observe("tp_05_shard", count(lit(1)))
  }

  /** Stages 1–3 (rules → fingerprint dedup → per-source quota), shared by
    * both pipeline variants.
    */
  private def upToQuota(docs: DataFrame, cfg: Config): DataFrame = {
    // stage 1: per-doc rule audit, keep rule-passing docs (the token array
    // stays in flight — stage 2 reuses it, so the corpus is scanned ONCE)
    val keep = TextOps.gopherComponents(col("__ts")).toMap.apply("keep")
    val kept = docs
      .select(col("doc_id"), col("source"),
        TextOps.tokens(col("text")).as("__ts"))
      .observe("tp_00_input", count(lit(1)))
      .filter(keep)
      .observe("tp_01_rules", count(lit(1)))
    // stage 2: content-fingerprint dedup, keep the earliest per simhash —
    // the per-row fingerprint column, not the explode/groupBy/join-back
    // form (which would re-execute stage 1 on the join's second branch)
    val tsh = transform(col("__ts"), t => StableHash.polyHash(t))
    val deduped = Dedup.keepFirst(
        kept.withColumn("simhash", Dedup.simhashCol(tsh, cfg.bits)).drop("__ts"),
        Seq("simhash"), Seq(col("doc_id")))
      .observe("tp_02_dedup", count(lit(1)))
    // stage 3: per-source quota (bounded window per source)
    val wq = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    deduped.withColumn("__rank", row_number().over(wq))
      .filter(col("__rank") <= cfg.capPerSource).drop("__rank")
      .observe("tp_03_quota", count(lit(1)))
  }
}
