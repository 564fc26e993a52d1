package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase
import graft.functions.StableHash

class GroupedOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("g1", 1, 10.0), ("g1", 2, 12.0), ("g1", 3, 30.0),
    ("g2", 4, 5.0), ("g2", 5, 100.0)).toDF("g", "id", "score")

  test("A7 mark: failing group marked, passing group untouched, counts kept") {
    val out = Grouped.groupedExistsMark(df, Seq("g"), col("score") > 50, "no_big")
    assert(out.count() == 5)
    val marked = out.filter(col("filter_reason").isNotNull)
      .select("g").distinct().as[String].collect().toSet
    assert(marked == Set("g1"))
  }

  test("A7 mark: existing reason wins (first-writer, filters.py:317-324)") {
    val pre = df.withColumn("filter_reason",
      when(col("id") === 1, "earlier").otherwise(lit(null)))
    val out = Grouped.groupedExistsMark(pre, Seq("g"), col("score") > 50, "no_big")
    val r = out.filter(col("id") === 1).select("filter_reason").as[String].head()
    assert(r == "earlier")
  }

  test("A8 top-k keeps k lowest with deterministic ties") {
    val out = Grouped.groupTopK(df, Seq("g"), col("score"), Seq(col("id")), 2)
    assert(out.filter(col("g") === "g1").select("id").as[Int].collect().sorted
      .sameElements(Array(1, 2)))
    assert(out.filter(col("g") === "g2").count() == 2)
  }

  test("A9 threshold-from-min") {
    val out = Grouped.withinThresholdOfMin(df, Seq("g"), col("score"), 0.25)
    // g1: min 10 → keep ≤ 12.5 → ids 1,2 ; g2: min 5 → keep ≤ 6.25 → id 4
    assert(out.select("id").as[Int].collect().sorted.sameElements(Array(1, 2, 4)))
  }

  test("A9 with negative scores: the group minimum always survives") {
    val neg = Seq(("g", 1, -3.0), ("g", 2, -2.9), ("g", 3, 1.0))
      .toDF("g", "id", "score")
    val kept = Grouped.withinThresholdOfMin(neg, Seq("g"), col("score"), 0.1)
      .select("id").as[Int].collect().sorted
    // min=-3.0 → keep ≤ -3.0 + 0.3 = -2.7 → ids 1,2
    assert(kept.sameElements(Array(1, 2)))
  }

  test("A5 regression recovers a known line") {
    val pts = (1 to 100).map(i => ("g", i.toDouble, 3.0 * i + 7.0))
      .toDF("g", "x", "y")
    val r = Grouped.groupedRegression(pts, Seq("g"), col("x"), col("y")).collect()(0)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 7.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }
}

class DedupOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.exact(df, col("text"), col("doc_id"))
      .orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_copies") == 2 && out(0).getAs[Long]("keep_id") == 1)
  }

  test("jaccard: identical docs = 1.0, disjoint docs absent") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramJaccard(df, "doc_id", col("text"), 2, None).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("id1") == 1 && out(0).getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: identical texts identical, different texts differ") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val m = Dedup.simhash(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L) && m(1L) != m(3L))
  }

  test("short documents (< k tokens) produce no shingles, not a crash") {
    val df = Seq((1L, "one two"), (2L, "a b c d e f")).toDF("doc_id", "text")
    // d3/d4/d6 all route through shinglesFromTokens; k=3 > 2 tokens
    val sigs = Dedup.lshPairs(df, "doc_id", col("text"), 3, 4, 4)
    assert(sigs.count() == 0) // no crash; doc 1 has empty shingle set
    val sh = df.select(Dedup.shingles(col("text"), 3).as("sh"))
      .selectExpr("size(sh)").as[Int].collect().sorted
    assert(sh.sameElements(Array(0, 4)))
  }

  test("lsh pairs: exact duplicates always collide") {
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "z1 z2 z3 z4 z5 z6")).toDF("doc_id", "text")
    val pairs = Dedup.lshPairs(df, "doc_id", col("text"), 3, 4, 4).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("connected components: chains collapse to min id, singletons self-map") {
    val nodes = (1L to 7L).toDF("doc_id")
    // chain 1-2-3 (transitive, no direct 1-3 edge), pair 5-6, singletons 4,7
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val out = Dedup.connectedComponents(nodes, edges, "doc_id", "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("simhash band pairs: brute-force parity on a small corpus") {
    // docs 1/2 identical (hamming 0); 3 near-identical to them; 4 far away
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 zz"),
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8")).toDF("doc_id", "text")
    val bits = 32; val bands = 4; val maxH = 4
    val got = Dedup.simhashBandPairs(df, "doc_id", col("text"), bits, bands, maxH)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    // brute-force reference: same fingerprints, all pairs, same predicate
    val fps = Dedup.simhash(df, "doc_id", col("text"), bits)
      .as[(Long, Long)].collect().toMap
    val w = bits / bands
    def share(a: Long, b: Long) = (0 until bands).exists(i =>
      ((a >> (i * w)) & ((1L << w) - 1)) == ((b >> (i * w)) & ((1L << w) - 1)))
    val want = (for {
      i <- fps.keys; j <- fps.keys if i < j
      h = java.lang.Long.bitCount(fps(i) ^ fps(j))
      if h <= maxH && share(fps(i), fps(j))
    } yield (i, j, h)).toSet
    assert(got === want)
    assert(got.contains((1L, 2L, 0)), s"exact dups must collide: $got")
  }

  test("d8 apply: one canonical survivor per d7 component, sizes partition the corpus") {
    val sf = "/root/testdata/sf0.001"
    val comps = graft.SparkEntry.queries("d7_dup_groups")(spark, sf)
      .select("component").distinct().as[Long].collect().toSet
    val d8 = graft.SparkEntry.queries("d8_dedup_apply")(spark, sf)
    val survivors = d8.select("doc_id").as[Long].collect().toSet
    assert(survivors == comps) // survivor ⇔ component representative
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(d8.agg(sum("group_size")).as[Long].head() == nDocs) // no doc lost or double-counted
  }

  test("chunkDedup: shared chunk kept only in the first doc, order preserved") {
    // doc 1: chunks [a b] [c d]; doc 2: chunks [c d] [e f] (chunk width 2).
    // "c d" is first seen in doc 1 at idx 2 → doc 2 keeps only "e f".
    val df = Seq((1L, "a b c d"), (2L, "c d e f"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, col("text"), "doc_id", 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_chunks"),
      r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))).toSeq == Seq(
      (1L, 2, 2L, "a b c d"),
      (2L, 2, 1L, "e f"),
      (3L, 1, 0L, ""))) // every chunk of doc 3 seen earlier → empty doc out
  }

  test("chunkDedup: ragged tail chunk is its own unit") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text") // [a b] + [c]
    val r = Dedup.chunkDedup(df, col("text"), "doc_id", 2).collect()(0)
    assert(r.getAs[Int]("n_chunks") == 2 && r.getAs[String]("kept_text") == "a b c")
  }

  test("editDistancePairs: blocked candidates, exact verify, bounded prefix") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilXn"),  // dist 1 from doc 1
      (3L, "alpha beta completely different tail here"), // same block, far
      (4L, "other block gamma delta epsilon")) // different block
      .toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(df, "doc_id", col("text"), 48, 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1)))
    // widening tau past the true distance (24) admits the same-block far
    // pairs too — the verify is the only thing excluding them above
    val wide = Dedup.editDistancePairs(df, "doc_id", col("text"), 48, 30)
      .as[(Long, Long, Int)].collect().toSet
    assert(wide.map(t => (t._1, t._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("ngramJaccard stop-shingle cap bounds pair count under a planted hot shingle") {
    // every doc opens with the same boilerplate 3-shingle ("hot hot hot");
    // all other shingles are doc-unique — the canonical hot-posting-list
    // corpus: one shared shingle makes EVERY doc pair a candidate
    val n = 30
    val df = (1L to n.toLong).map(i => (i, s"hot hot hot u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    // uncapped: the hot list alone generates all C(30,2) pairs
    val uncapped = Dedup.ngramJaccard(df, "doc_id", col("text"), 3, None)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.size == n * (n - 1) / 2)
    // cap below the hot-list length: the stop-shingle is dropped, no other
    // shingle is shared, pair count collapses to zero — the quadratic term
    // is provably bounded by the cap
    val capped = Dedup.ngramJaccard(df, "doc_id", col("text"), 3, None,
      maxPostingLen = 10)
    assert(capped.count() == 0)
    // cap above every list length = the uncapped operator exactly (the
    // regime the d6 gate runs in, keeping its oracle cap-free)
    val wide = Dedup.ngramJaccard(df, "doc_id", col("text"), 3, None,
      maxPostingLen = 1000).as[(Long, Long, Double)].collect().toSet
    assert(wide == uncapped)
  }

  test("simhash64: lane range, identical-text equality, band-pairs brute parity") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 zz"),
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8")).toDF("doc_id", "text")
    val fps = Dedup.simhash64(df, "doc_id", col("text"))
      .as[(Long, Long, Long)].collect() // (doc_id, sim_hi, sim_lo)
    // both lanes full-width non-negative 32-bit (the affine mod-2³² rehash
    // must fill bits polyHash's ~30-bit range leaves at zero)
    fps.foreach { case (_, hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32)) }
    assert(fps.exists { case (_, hi, lo) => hi >= (1L << 30) || lo >= (1L << 30) })
    val m = fps.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1L) == m(2L) && m(1L) != m(4L))
    // brute-force reference: same per-lane fingerprints, all pairs, same
    // share-a-band ∧ hamming≤h predicate (mirrors the 32-bit parity test)
    val bpl = 4; val maxH = 6
    val got = Dedup.simhash64BandPairs(df, "doc_id", col("text"), bpl, maxH)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    def share(a: Long, b: Long) = (0 until bpl).exists(i =>
      ((a >> (i * 8)) & 255) == ((b >> (i * 8)) & 255))
    val want = (for {
      i <- m.keys; j <- m.keys if i < j
      h = java.lang.Long.bitCount(m(i)._1 ^ m(j)._1) +
        java.lang.Long.bitCount(m(i)._2 ^ m(j)._2)
      if h <= maxH && (share(m(i)._1, m(j)._1) || share(m(i)._2, m(j)._2))
    } yield (i, j, h)).toSet
    assert(got === want)
    assert(got.contains((1L, 2L, 0)), s"exact dups must collide: $got")
  }

  test("simhash64 band geometry is a pure cost knob: any >maxHamming band " +
    "count yields the identical verified pair set (pigeonhole recall 1.0)") {
    // richer corpus: exact dups, 1-token variants, unrelated docs
    val df = (1L to 40L).map { i =>
      val base = s"tok${i % 7} alpha beta gamma delta epsilon zeta eta"
      (i, if (i % 3 == 0) base + " extra" else base)
    }.toDF("doc_id", "text")
    def pairs(bpl: Int) =
      Dedup.simhash64BandPairs(df, "doc_id", col("text"), bpl, maxHamming = 3)
        .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val p2 = pairs(2) // 4 bands of 16 bits -- the d13 production geometry
    val p4 = pairs(4) // 8 bands of 8 bits -- the pre-round-6 geometry
    assert(p2 === p4, "band geometry changed the verified pair set")
    assert(p2.nonEmpty, "corpus must exercise the positive path")
  }

  test("long-keyed bloom: no false negatives on packed composite keys") {
    // packed (u,v) edge keys, the triangle-wedge pruning shape
    val pack = (u: Long, v: Long) => (u << 32) + v
    val edges = (1L to 300L).map(i => pack(i, i + 1)).toDF("k")
    val probe = Bloom.mightContainLong(edges, "k", expectedItems = 300, fpp = 0.01)
    val present = (1L to 300L).map(i => pack(i, i + 1)).toDF("k")
      .filter(probe(col("k"))).count()
    assert(present == 300L) // bloom guarantee: every built key passes
    // absent keys are mostly rejected (fpp-bounded, not exact — the
    // caller's exact semi-join is what makes the final result exact)
    val absent = (1L to 1000L).map(i => pack(i + 5000, i)).toDF("k")
      .filter(probe(col("k"))).count()
    assert(absent < 100L, s"absent-key pass-through too high: $absent")
  }

  test("bloom prefilter: no false negatives; exact verify removes false positives") {
    val build = (1 to 200).map(i => s"key$i").toDF("g")
    val probe = Bloom.mightContain(build, "g", expectedItems = 200, fpp = 0.01)
    val hits = (150 to 400).map(i => s"key$i").toDF("g")
      .filter(probe(col("g"))).as[String].collect().toSet
    // every true member passes (bloom guarantee)…
    assert((150 to 200).forall(i => hits.contains(s"key$i")))
    // …and after the exact join, ONLY true members remain regardless of fpp
    val exact = (150 to 400).map(i => s"key$i").toDF("g")
      .filter(probe(col("g"))).join(build, Seq("g")).as[String].collect().toSet
    assert(exact == (150 to 200).map(i => s"key$i").toSet)
  }
}

class SimilarityOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("kmeansTrain converges to the two obvious cluster means") {
    // two tight clusters on orthogonal axes; seeds = one member of each
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f, 0.0f)),
      (2L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.9f, 0.0f, 0.0f, 0.1f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.1f)),
      (5L, Array(0.1f, 1.0f, 0.1f, 0.0f)),
      (6L, Array(0.0f, 0.9f, 0.0f, 0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val trained = Similarity.kmeansTrain(df, "vec_id", "embedding",
      col("vec_id") === 1 || col("vec_id") === 4, iters = 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(trained.keySet == Set(1L, 4L))
    // cluster {1,2,3} mean x-component = (1.0 + 1.0 + 0.9)/3
    assert(math.abs(trained(1L).head - (1.0 + 1.0 + 0.9f.toDouble) / 3) < 1e-6)
    assert(math.abs(trained(4L)(1) - (1.0 + 1.0 + 0.9f.toDouble) / 3) < 1e-6)
    // means dominated by the cluster axis
    assert(trained(1L).head > trained(1L)(1))
    assert(trained(4L)(1) > trained(4L).head)
  }

  test("semDedup keeps exactly the vectors with no smaller-id bucket near-dup") {
    val rnd = new scala.util.Random(7)
    val dim = 8; val n = 60; val planes = 3; val t = 0.5
    val vecs = (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    // scalar mirrors of hyperplaneBucket (bit h = 1 iff v·plane_h > 0) and
    // the sequential-fold cosine — same index order, so bit-identical
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def bucket(v: Array[Float]): Long =
      (0 until planes).foldLeft(0L) { (acc, h) =>
        val d = v.indices.foldLeft(0.0)((s, i) =>
          s + v(i).toDouble * Similarity.planeComponent(h, i))
        if (d > 0) acc | (1L << h) else acc
      }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val keepRef = vecs.collect { case (id, v) if !vecs.exists { case (id2, v2) =>
      id2 < id && bucket(v2) == bucket(v) && cos(v2, v) > t
    } => id }.toSet
    val got = Similarity.semDedup(df, "vec_id", "embedding", dim, planes, t)
      .select("vec_id").as[Long].collect().toSet
    assert(got == keepRef && got.size < n, s"got ${got.size} of $n")
  }

  test("semDedupKmeans drops exactly the smaller-id within-cluster near-dups") {
    // two tight clusters; within each, later vectors are near-copies of the
    // first → k-means assigns each group to its own centroid and the prune
    // keeps only the lowest id per near-dup set, plus the outlier
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.05f, 0.0f)),
      (2L, Array(0.98f, 0.02f, 0.0f, 0.0f)),   // near-dup of 1
      (3L, Array(0.97f, 0.0f, 0.0f, 0.03f)),   // near-dup of 1
      (4L, Array(0.0f, 1.0f, 0.0f, 0.05f)),
      (5L, Array(0.02f, 0.99f, 0.03f, 0.0f)),  // near-dup of 4
      (6L, Array(0.0f, 0.0f, -1.0f, 0.0f)))    // no near-dup anywhere
    val df = vecs.toDF("vec_id", "embedding")
    val kept = Similarity.semDedupKmeans(df, "vec_id", "embedding",
      seedPred = col("vec_id") === 1 || col("vec_id") === 4,
      iters = 2, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 6L), s"kept=$kept")
  }

  test("cosine: identity 1, orthogonal 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val cs = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12 && math.abs(cs(1)) < 1e-12)
  }

  test("brute-force top-k ranks the most similar first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 0.01f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 2).collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(3L, 1L))
  }
}

class CustomExprSpec extends SparkTestBase {
  import spark.implicits._

  test("PolyHashExpr equals the portable higher-order fold") {
    val df = Seq("", "a", "spark", "the quick brown fox 123 !?",
      "w1 w2 w3 w4").toDF("s")
    val diff = df.select(
      StableHash.polyHash(col("s")).as("fast"),
      StableHash.polyHashHof(col("s")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("PolyHash64Expr equals the portable paired higher-order fold") {
    val df = Seq("", "a", "spark", "the quick brown fox 123 !?",
      "w1 w2 w3 w4").toDF("s")
    val diff = df.select(
      StableHash.polyHash64(col("s")).as("fast"),
      StableHash.polyHash64Hof(col("s")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("PackedPairsExpr equals the flatten/transform/slice reference") {
    // sorted ascending < 2^30 (the caller contract); sizes 0..4 cover the
    // empty, single (no pairs), and multi-pair branches
    val df = Seq(
      Seq.empty[Long],
      Seq(7L),
      Seq(3L, 9L),
      Seq(1L, 2L, 5L, 1000000L)).toDF("ns")
    val ref = "flatten(transform(ns, (x, i) -> " +
      "transform(slice(ns, i + 2, size(ns)), v -> (x * 4294967296L + v) * 2 + 1)))"
    val diff = df.select(
        graft.functions.Exprs.packedPairs(col("ns")).as("fast"),
        expr(ref).as("refv"))
      .filter(col("fast") =!= col("refv")).count()
    assert(diff == 0)
    // and the packed values decode to the expected (u, v) pairs in order
    val got = df.filter(size(col("ns")) === 4)
      .select(explode(graft.functions.Exprs.packedPairs(col("ns"))).as("k"))
      .select(expr("k div 2 div 4294967296L"), expr("(k div 2) % 4294967296L"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (1L, 5L), (1L, 1000000L),
      (2L, 5L), (2L, 1000000L), (5L, 1000000L)))
  }

  test("PackedPairsExpr guard: unsorted input fails loudly, never " +
    "corrupts keys (ADVICE r10)") {
    val bad = Seq(Seq(9L, 3L)).toDF("ns")
    val e = intercept[Exception] {
      bad.select(graft.functions.Exprs.packedPairs(col("ns"))).collect()
    }
    assert(e.getMessage.contains("strictly ascending")
      || Option(e.getCause).exists(_.getMessage.contains("strictly ascending")),
      s"wanted the contract message, got: ${e.getMessage}")
    // duplicates violate strict ascent too (they'd pack u == v keys)
    val dup = Seq(Seq(3L, 3L)).toDF("ns")
    intercept[Exception] {
      dup.select(graft.functions.Exprs.packedPairs(col("ns"))).collect()
    }
  }

  test("PackedPairsExpr guard: out-of-range elements fail loudly") {
    val big = Seq(Seq(1L, 1L << 30)).toDF("ns") // 2^30 is first invalid id
    val e = intercept[Exception] {
      big.select(graft.functions.Exprs.packedPairs(col("ns"))).collect()
    }
    assert(e.getMessage.contains("2^30")
      || Option(e.getCause).exists(_.getMessage.contains("2^30")))
    val neg = Seq(Seq(-1L, 5L)).toDF("ns")
    intercept[Exception] {
      neg.select(graft.functions.Exprs.packedPairs(col("ns"))).collect()
    }
  }

  test("PackedPairsExpr guard: element counts past the int-pair-count " +
    "bound fail fast instead of allocating a negative-size array") {
    // interpreted-eval path, directly — building a 70k-element DF column
    // just to trip the first check is wasted work
    val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Long](0))
    val e = intercept[IllegalArgumentException] {
      graft.functions.PackedPairsExpr.checkContract(a, 70000)
    }
    assert(e.getMessage.contains("70000"))
  }

  test("MinHashExpr equals the n-pass array_min reference, incl. empty") {
    val df = Seq(
      Seq(5L, 999999999L, 0L, 123456789L),
      Seq(42L),
      Seq.empty[Long], // reference yields NULL sigs; fused must too
      (1L to 200L).toSeq)
      .toDF("hs")
    val n = 16
    val fused = Dedup.withMinhashSigs(df, col("hs"), n).drop("hs")
    val refCols = Dedup.minhashSigs(col("hs"), n)
    val ref = df.select(refCols.map { case (nm, c) => c.as(nm) }: _*)
    // row-aligned comparison via except in both directions (schemas match)
    assert(fused.exceptAll(ref).count() == 0 && ref.exceptAll(fused).count() == 0)
  }

  test("MinHashExpr skips null slots and yields NULL for all-null arrays") {
    val df = Seq(
      Seq[java.lang.Long](5L, null, 123456789L), // null slot must not fold b%P in
      Seq[java.lang.Long](null),                 // all-null → NULL, like array_min
      Seq[java.lang.Long](null, null, 42L))
      .toDF("hs")
    val n = 8
    val fused = Dedup.withMinhashSigs(df, col("hs"), n).drop("hs")
    val refCols = Dedup.minhashSigs(col("hs"), n)
    val ref = df.select(refCols.map { case (nm, c) => c.as(nm) }: _*)
    assert(fused.exceptAll(ref).count() == 0 && ref.exceptAll(fused).count() == 0)
  }

  test("CosineExpr is bit-identical to the composed dot/norm form") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 200).map { i =>
      // include a length mismatch: tail-loop norms must match the
      // composed form's full-array norms exactly
      val la = 16; val lb = if (i % 7 == 0) 12 else 16
      (Array.fill(la)(rnd.nextFloat() * 4 - 2), Array.fill(lb)(rnd.nextFloat() * 4 - 2))
    }
    val df = rows.toDF("a", "b")
    val composed = graft.functions.Exprs.seqDot(col("a"), col("b")) /
      (sqrt(graft.functions.Exprs.seqDot(col("a"), col("a"))) *
        sqrt(graft.functions.Exprs.seqDot(col("b"), col("b"))))
    val diff = df.select(
        graft.functions.Exprs.cosine(col("a"), col("b")).as("fused"),
        composed.as("ref"))
      .filter(col("fused") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("SeqDotExpr equals the interpreted zip_with fold") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.75f, -1.5f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.7f))).toDF("a", "b")
    val rows = df.select(
      graft.functions.Exprs.seqDot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(rows == 0)
  }

  test("SeqL2Expr equals the unrolled subspace fold") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f, 0.5f), Array(0.5f, 4.75f, -1.5f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f, 0.4f), Array(0.4f, 0.3f, 0.2f, 0.1f)))
      .toDF("a", "b")
    def unrolled(off: Int, n: Int) = (0 until n).map { i =>
      val d = col("a").getItem(off + i).cast("double") -
        col("b").getItem(off + i).cast("double")
      d * d
    }.foldLeft(lit(0.0))(_ + _)
    val rows = df.select(
      graft.functions.Exprs.seqL2(col("a"), col("b"), 1, 2).as("fast"),
      unrolled(1, 2).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(rows == 0)
  }
}

class StableHashSpec extends AnyFunSuite {
  test("polyHash range invariant holds on random strings (property)") {
    def ref(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % StableHash.P)
    val prop = Prop.forAll(Gen.alphaNumStr) { s =>
      val h = ref(s); h >= 0 && h < StableHash.P
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
  test("polyHash64 separates single-prime collisions (the span-dedup bound)") {
    // The failure mode the wide tier exists for: distinct grams colliding
    // mod P (~2^30 range — birthday kicks in around ~50k distinct strings)
    // would be MARKED DUPLICATE by span dedup. Brute-force a real mod-P
    // collision (deterministic seed), then pin that the paired ~2^60
    // fingerprint still tells the two strings apart.
    def refP(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % StableHash.P)
    def ref64(s: String) =
      refP(s) * 2147483648L +
        s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % StableHash.P2)
    val rnd = new scala.util.Random(20260814L)
    def gram() = Seq.fill(9)(('a' + rnd.nextInt(26)).toChar).mkString
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    val collision = Iterator.continually(gram())
      .take(400000)
      .flatMap { s =>
        val h = refP(s)
        seen.get(h) match {
          case Some(prev) if prev != s => Some((prev, s))
          case _ => seen.update(h, s); None
        }
      }
      .buffered.headOption
    assert(collision.isDefined,
      "expected a mod-P birthday collision within 400k distinct 9-grams")
    val (s1, s2) = collision.get
    assert(refP(s1) == refP(s2) && s1 != s2)
    assert(ref64(s1) != ref64(s2),
      s"paired fingerprint must separate '$s1' / '$s2'")
  }

  test("affine params are stable and nonzero") {
    val p = StableHash.affineParams(16)
    assert(p == StableHash.affineParams(16))
    assert(p.forall { case (a, _) => a != 0 })
  }
}
