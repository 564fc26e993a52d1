package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase

/** Property tests for span-level dedup ([[Dedup.dupSpans]] /
  * [[Dedup.spanClean]]): on random small-vocab corpora (tiny vocab ⇒
  * cross-doc k-gram collisions are common), the shingle-hash → dup-hash →
  * island-merge pipeline must agree with a plain-Scala reference that
  * works on the literal grams (no hashing) — so a hash mismatch between
  * occurrences of the SAME gram, an off-by-one in the position explode, or
  * a wrong merge gap would all surface here rather than at the corpus
  * gate (whose natural duplication can't cover, e.g., span-at-end-of-doc
  * or fully-duplicated-doc shapes that the generator does hit).
  */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 3

  // corpora of 2-8 docs, 0-14 tokens each, over a 4-word vocab
  private val genCorpus: Gen[List[String]] = {
    val word = Gen.oneOf("a", "bb", "ccc", "dd")
    Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 14).flatMap(m =>
        Gen.listOfN(m, word).map(_.mkString(" ")))))
  }

  /** positions (1-based) of k-grams occurring in ≥2 distinct docs */
  private def bruteHits(texts: List[String]): Map[Int, Seq[Int]] = {
    def grams(t: String): Seq[(String, Int)] = {
      val ts = t.split(" ", -1)
      if (ts.length < K) Seq.empty
      else (0 to ts.length - K).map(i => (ts.slice(i, i + K).mkString(" "), i + 1))
    }
    val byGram = texts.zipWithIndex
      .flatMap { case (t, d) => grams(t).map { case (g, p) => (g, d, p) } }
    val dup = byGram.groupMap(_._1)(_._2).collect {
      case (g, ds) if ds.distinct.size >= 2 => g
    }.toSet
    byGram.filter(x => dup(x._1)).groupMap(_._2)(_._3)
      .view.mapValues(_.sorted.toSeq).toMap
  }

  /** island merge with gap ≤ K → (start, end) spans */
  private def bruteSpans(hits: Seq[Int]): Seq[(Int, Int)] =
    hits.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
      acc.lastOption match {
        case Some((s, e)) if p - (e - (K - 1)) <= K => acc.init :+ (s, p + K - 1)
        case _ => acc :+ (p, p + K - 1)
      }
    }

  private def corpusDf(texts: List[String]) =
    texts.zipWithIndex.map { case (t, d) => (d.toLong, t) }.toDF("doc_id", "text")

  test("dupSpans agrees with the literal-gram brute-force reference") {
    val prop = Prop.forAll(genCorpus) { texts =>
      val want = bruteHits(texts).view.mapValues(bruteSpans).toMap
      val got = Dedup.dupSpans(corpusDf(texts), "doc_id", col("text"), K)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Int, Int)].collect()
        .groupBy(_._1.toInt)
        .view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq).toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("spans are disjoint, non-adjacent, and inside the doc") {
    val prop = Prop.forAll(genCorpus) { texts =>
      val spans = Dedup.dupSpans(corpusDf(texts), "doc_id", col("text"), K)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Int, Int)].collect()
        .groupBy(_._1).values
      spans.forall { ss =>
        val sorted = ss.map(x => (x._2, x._3)).sortBy(_._1)
        val len = texts(ss.head._1.toInt).split(" ", -1).length
        sorted.forall { case (s, e) => s >= 1 && e <= len && e - s + 1 >= K } &&
          sorted.toSeq.sliding(2).forall {
            case Seq((_, e1), (s2, _)) => s2 > e1 + 1  // a merge missed ⇒ fail
            case _ => true
          }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("spanClean removes exactly the covered tokens, order preserved") {
    val prop = Prop.forAll(genCorpus) { texts =>
      val covered = bruteHits(texts).view.mapValues(hs =>
        bruteSpans(hs).flatMap { case (s, e) => s to e }.toSet).toMap
      val want = texts.zipWithIndex.map { case (t, d) =>
        val ts = t.split(" ", -1)
        val cov = covered.getOrElse(d, Set.empty)
        val kept = ts.zipWithIndex.collect { case (w, i) if !cov(i + 1) => w }
        (d.toLong, ts.length, kept.length, kept.mkString(" "))
      }.toSet
      val got = Dedup.spanClean(corpusDf(texts), "doc_id", col("text"), K)
        .as[(Long, Int, Int, String)].collect().toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("incrementalDupSpans against a parquet-persisted store equals the full recompute") {
    // the production shape end-to-end: history's gram-hash store is
    // WRITTEN to parquet and read back (the batch never touches history
    // rows), then the incremental spans must equal dupSpans over the full
    // corpus restricted to batch docs — the symmetry argument d23's
    // oracle leans on, here exercised through a real persisted store
    val prop = Prop.forAll(genCorpus) { texts =>
      val all = corpusDf(texts)
      val batch = all.filter(col("doc_id") % 2 === 0)
      val history = all.filter(col("doc_id") % 2 =!= 0)
      val dir = java.nio.file.Files.createTempDirectory("spanstore").toString
      Dedup.spanHashStore(history, "doc_id", col("text"), K)
        .write.mode("overwrite").parquet(dir)
      val store = spark.read.parquet(dir)
      val got = Dedup.incrementalDupSpans(batch, store, "doc_id",
          col("text"), K)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Int, Int)].collect().toSet
      val want = Dedup.dupSpans(all, "doc_id", col("text"), K)
        .filter(col("doc_id") % 2 === 0)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Int, Int)].collect().toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("incrementalDupSpans: store-only hits fire without any within-batch support") {
    // one batch doc, zero within-batch duplication — every span must come
    // from the store probe (the path the full-corpus gate can't isolate)
    val batch = Seq((0L, "a bb ccc dd a bb")).toDF("doc_id", "text")
    val history = Seq((1L, "a bb ccc x y z")).toDF("doc_id", "text")
    val store = Dedup.spanHashStore(history, "doc_id", col("text"), K)
    val got = Dedup.incrementalDupSpans(batch, store, "doc_id", col("text"), K)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Int, Int)].collect().toSet
    assert(got == Set((0L, 1, 3)), got.toString)
  }
}
