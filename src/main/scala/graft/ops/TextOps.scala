package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Text-analysis operators for large-scale training-data pipelines
  * (builder-prompt first-class extension; no catlas counterpart — the
  * reference's string surface stops at regex extraction, SURVEY §2.8).
  *
  * Everything is a pure column expression: per-row, shuffle-free,
  * codegen-friendly, and linear in text length — the properties that let a
  * quality-scoring pass run over 100 TB as a single narrow map stage fused
  * into the parquet scan.
  */
object TextOps {

  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks — the usual pre-tokenizer regex shape.
    */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Document fingerprint: rolling hash of the full text (portable tier);
    * at scale swap for xxhash64(text) — same operator shape.
    */
  def fingerprint(text: Column): Column = StableHash.polyHash(text)

  // ---- language ID -------------------------------------------------------

  /** Deterministic "stopword" profiles per language tag. The corpus is
    * synthetic word salad, so these are vocabulary slices, not linguistics;
    * the operator shape (per-language token-overlap score → argmax with a
    * fixed tie order) is the real n-gram-heuristic langid shape.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "data", "group", "window", "batch"),
    "en" -> Seq("the", "a", "fast", "join", "query", "table"),
    "es" -> Seq("el", "la", "sort", "merge", "value", "row"),
    "fr" -> Seq("le", "et", "hash", "filter", "scan", "column"),
    "zh" -> Seq("de5", "shi4", "spark", "stream", "vector", "key"))

  /** Per-language hit ratio: |tokens ∩ profile| / |tokens|. */
  def langScore(toks: Column, profile: Seq[String]): Column = {
    val profileSet = profile.toSet
    size(filter(toks, t => t.isInCollection(profileSet))).cast("double") /
      size(toks).cast("double")
  }

  /** Predicted language: first language (in fixed `langProfiles` order)
    * whose score equals the max — deterministic under ties.
    */
  def langPredict(toks: Column): Column = {
    val scores = langProfiles.map { case (l, p) => l -> langScore(toks, p) }
    val g = greatest(scores.map(_._2): _*)
    scores.foldRight(lit(null).cast("string")) { case ((l, sc), acc) =>
      when(sc === g, lit(l)).otherwise(acc)
    }
  }

  // ---- quality scoring ---------------------------------------------------

  /** Heuristic quality components: length, token stats, lexical diversity,
    * stopword ratio — the standard cheap pre-filter before expensive model
    * scoring (cf. catlas's cheap-model→filter→expensive-model cascade M5).
    */
  def qualityComponents(text: Column): Seq[(String, Column)] = {
    val ts = tokens(text)
    val nTok = size(ts).cast("double")
    val stop = Seq("the", "a", "and", "of")
    val stopSet = stop.toSet
    Seq(
      "n_tokens" -> size(ts),
      "n_distinct" -> size(array_distinct(ts)),
      "diversity" -> (size(array_distinct(ts)).cast("double") / nTok),
      "mean_token_len" -> ((length(text) - (size(ts) - 1)).cast("double") / nTok),
      "stopword_ratio" ->
        (size(filter(ts, t => t.isInCollection(stopSet))).cast("double") / nTok))
  }

  /** Scalar quality score: diversity-weighted, stopword-penalized, length-
    * normalized; fixed expression tree (bit-stable cross-engine).
    */
  def qualityScore(text: Column): Column = {
    val comps = qualityComponents(text).toMap
    comps("diversity") * lit(0.6) +
      (lit(1.0) - comps("stopword_ratio")) * lit(0.3) +
      least(comps("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.1)
  }

  /** DuckDB twin of [[qualityScore]] over a pre-split token-list column
    * `ts` — the same left-associated double tree (t2's oracle spells the
    * identical math through its component CTE; d21 selects ON the score,
    * so it shares this single-expression form).
    */
  def qualityScoreSql(ts: String): String =
    s"(CAST(len(list_distinct($ts)) AS DOUBLE) / CAST(len($ts) AS DOUBLE) * 0.6" +
      s" + (1.0 - CAST(len(list_filter($ts, t -> list_contains(['the','a','and','of'], t))) AS DOUBLE)" +
      s" / CAST(len($ts) AS DOUBLE)) * 0.3" +
      s" + least(CAST(len($ts) AS DOUBLE) / 100.0, 1.0) * 0.1)"

  // ---- PII redaction -----------------------------------------------------

  /** PII patterns restricted to the Java-regex ∩ RE2 common subset so the
    * Spark expressions and the DuckDB oracle share one definition
    * (character classes, bounded/unbounded repetition, ASCII \b only).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+\\d[\\d ]{6,}\\d"

  /** Redact emails, then IPs, then phone numbers — in that order: the
    * earlier placeholders contain no digits, so the greedy phone pattern
    * cannot swallow a just-redacted IP's digit runs. Pure narrow map;
    * linear scans at 100 TB.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
        lit(ipv4Re), lit("<IP>")),
      lit(phoneRe), lit("<PHONE>"))

  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(emailRe), lit(0))),
    "n_ips" -> size(regexp_extract_all(text, lit(ipv4Re), lit(0))),
    "n_phones" -> size(regexp_extract_all(text, lit(phoneRe), lit(0))))

  // ---- Gopher-style rule filter ------------------------------------------

  /** Stopword floor vocabulary for the rule filter (Gopher uses a short
    * English function-word list; the corpus is synthetic, so this is the
    * slice of that list it actually contains).
    */
  val gopherStopwords = Seq("the", "a", "of", "to", "and", "in")

  /** Gopher-style quality rules (Rae et al. 2021, §A1.1 shape): hard
    * bounds on word count and mean word length plus a stopword-presence
    * floor, each surfaced as its own boolean so a pipeline can audit WHY a
    * document was dropped. Pure per-row expressions — at 100 TB this is a
    * narrow map fused into the scan, run before any model-based scoring.
    * Thresholds are corpus-tuned so every rule both passes and fails real
    * rows (non-vacuous on the synthetic corpus: words 10–99, mean length
    * 3.7–5.3, stopword count 0–14).
    */
  def gopherComponents(ts: Column): Seq[(String, Column)] = {
    val n = size(ts)
    val charSum = aggregate(ts, lit(0L), (acc, w) => acc + length(w))
    val meanLen = charSum.cast("double") / n.cast("double")
    val stopSet = gopherStopwords.toSet
    val stopCnt = size(filter(ts, w => w.isInCollection(stopSet)))
    val wordsOk = n >= 30 && n <= 90
    val lenOk = meanLen >= 4.0 && meanLen <= 5.0
    val stopOk = stopCnt >= 2
    Seq(
      "n_words" -> n,
      "mean_word_len" -> meanLen,
      "stop_count" -> stopCnt,
      "words_ok" -> wordsOk,
      "word_len_ok" -> lenOk,
      "stop_ok" -> stopOk,
      "keep" -> (wordsOk && lenOk && stopOk))
  }

  // ---- intra-document repetition ----------------------------------------

  /** Repetition score from word 5-grams: 1 − distinct/total. A boilerplate-
    * heavy document repeats its n-grams; clean prose doesn't. Per-row only.
    */
  def repetitionComponents(ts: Column, k: Int = 5): Seq[(String, Column)] = {
    val nGrams = when(size(ts) >= k, size(ts) - (k - 1)).otherwise(lit(0))
    val nDistinct = size(Dedup.shinglesFromTokens(ts, k))
    Seq("n_grams" -> nGrams, "n_distinct" -> nDistinct,
      "repetition" -> when(nGrams > 0,
        lit(1.0) - nDistinct.cast("double") / nGrams.cast("double"))
        .otherwise(lit(0.0)))
  }
}
