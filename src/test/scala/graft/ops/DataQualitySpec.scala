package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkTestBase {
  import spark.implicits._
  import DataQuality._

  test("audit counts each violation kind in one pass") {
    val df = Seq(
      (1L, "ok text", "en", 100L),
      (2L, null: String, "de", 200L),   // null text
      (2L, "dup id", "fr", 300L),       // duplicate doc_id
      (3L, "too long", "xx", 900L),     // bad lang + out of range
      (4L, "fine", null: String, 50L))  // null lang: Matches must NOT count
      .toDF("doc_id", "text", "lang", "n_chars")
    val viol = audit(df, Seq(
      NotNull("text"), Unique("doc_id"),
      InRange("n_chars", 1, 400), Matches("lang", "en|de|fr")))
      .select("check", "violations").as[(String, Long)].collect().toMap
    assert(viol == Map(
      "not_null_text" -> 1L, "unique_doc_id" -> 1L,
      "range_n_chars" -> 1L, "matches_lang" -> 1L), s"got $viol")
    // n_rows rides every row
    val nrows = audit(df, Seq(NotNull("text")))
      .select("n_rows").as[Long].collect()
    assert(nrows.toSeq == Seq(5L))
  }

  test("quarantineTag routes rows with a per-rule CSV; agrees with audit") {
    val df = Seq(
      (1L, "ok text", "en", 100L),
      (2L, null: String, "de", 200L),
      (3L, "too long", "xx", 900L),     // two rules fire on one row
      (4L, "fine", null: String, 50L))  // null lang/range: clean
      .toDF("doc_id", "text", "lang", "n_chars")
    val checks = Seq(NotNull("text"),
      InRange("n_chars", 1, 400), Matches("lang", "en|de|fr"))
    val tags = quarantineTag(df, checks)
      .select("doc_id", "failed_checks").as[(Long, String)].collect().toMap
    assert(tags == Map(1L -> "", 2L -> "not_null_text",
      3L -> "range_n_chars,matches_lang", 4L -> ""), s"got $tags")
    // per-rule row totals equal the one-pass audit's counts
    val fromTags = checks.map(c => c.name ->
      quarantineTag(df, checks)
        .filter(array_contains(split(col("failed_checks"), ","), c.name))
        .count()).toMap
    val fromAudit = audit(df, checks)
      .select("check", "violations").as[(String, Long)].collect().toMap
    assert(fromTags == fromAudit, s"$fromTags vs $fromAudit")
  }

  test("quarantineTag rejects aggregate-scoped Unique loudly") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      quarantineTag(df, Seq(Unique("doc_id")))
    }
  }
}
