package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the honest-scaling contract of the replication transforms: each
  * copy key yields a distinct letter BIJECTION, and two-level composition
  * (the sf10 recipe: level-1 keys 1..9, level-2 keys 11..19) never
  * reproduces another combination's total map — the property caesar
  * rotations lacked (shifts add mod 26, so 100 combos shared 26 maps and
  * replanted verbatim duplicate docs).
  */
class ScaleTransformsSpec extends AnyFunSuite {

  private val az = "abcdefghijklmnopqrstuvwxyz"

  test("perm(c) is a bijection of the alphabet for every key used") {
    for (c <- 1 to 30) {
      val p = ScaleTransforms.perm(c)
      assert(p.sorted == az, s"perm($c) is not a permutation: $p")
    }
  }

  test("distinct keys give distinct permutations") {
    val ps = (1 to 30).map(ScaleTransforms.perm)
    assert(ps.distinct.size == ps.size)
  }

  test("all 100 two-level compositions are pairwise distinct maps") {
    // level-1 copy 0 and level-2 copy 0 are identity (remapText contract)
    def map1(c1: Int): String = if (c1 == 0) az else ScaleTransforms.perm(c1)
    def composed(c1: Int, c2: Int): String = {
      val m1 = map1(c1)
      val m2 = if (c2 == 0) az else ScaleTransforms.perm(10 + c2)
      // total map: base letter -> m1 -> m2
      m1.map(ch => m2(ch - 'a'))
    }
    val all = for (c1 <- 0 until 10; c2 <- 0 until 10) yield composed(c1, c2)
    assert(all.distinct.size == 100,
      s"composed maps collide: only ${all.distinct.size} distinct — " +
        "cross-copy verbatim duplicates would exist at sf10")
  }

  private val Dim = graft.queries.SimilarityQueries.DIM

  test("dimPerm is a bijection and dimSigns is ±1 for every key used") {
    for (c <- 1 to 30) {
      val p = ScaleTransforms.dimPerm(c, Dim)
      assert(p.sorted.sameElements(0 until Dim), s"dimPerm($c) not a permutation")
      assert(ScaleTransforms.dimSigns(c, Dim).forall(s => s == 1 || s == -1))
    }
  }

  test("all 100 two-level signed-permutation compositions are pairwise distinct") {
    // MakeSf1 keys: level-1 copies 1..9 (copy 0 identity), level-2 keys
    // 11..19 via textKeyOffset=10 (copy 0 identity). The composed map of
    // (sign s2, perm p2) after (s1, p1) is out[i] = s2[i]·s1[p2[i]] ·
    // v[p1[p2[i]]] — a signed permutation again; brute-force all 100.
    def sp(c: Int): (Array[Int], Array[Int]) =
      if (c == 0) (Array.tabulate(Dim)(identity), Array.fill(Dim)(1))
      else (ScaleTransforms.dimPerm(c, Dim), ScaleTransforms.dimSigns(c, Dim))
    def composed(c1: Int, c2: Int): Seq[(Int, Int)] = {
      val (p1, s1) = sp(c1)
      val (p2, s2) = sp(if (c2 == 0) 0 else 10 + c2)
      (0 until Dim).map(i => (p1(p2(i)), s2(i) * s1(p2(i))))
    }
    val all = for (c1 <- 0 until 10; c2 <- 0 until 10) yield composed(c1, c2)
    assert(all.distinct.size == 100,
      s"composed signed permutations collide: only ${all.distinct.size} " +
        "distinct — cross-copy duplicate vectors would exist at sf10, " +
        "re-locking the ANN family out of second-decade evidence")
  }
}

class ScaleTransformsSparkSpec extends SparkTestBase {
  import spark.implicits._

  test("remapText is length-preserving, space-preserving, and identity at c=0") {
    val df = Seq("the quick brown fox", "a b  c", "").toDF("text")
    val out = df.select(col("text"),
      ScaleTransforms.remapText(col("text"), 0).as("t0"),
      ScaleTransforms.remapText(col("text"), 3).as("t3"))
      .collect()
    out.foreach { r =>
      val (t, t0, t3) = (r.getString(0), r.getString(1), r.getString(2))
      assert(t0 == t)
      assert(t3.length == t.length)
      assert(t.zip(t3).forall { case (a, b) => (a == ' ') == (b == ' ') })
    }
  }

  test("permuteEmbedding preserves norms/dots within copy, identity at c=0") {
    val dim = graft.queries.SimilarityQueries.DIM
    val v = Array.tabulate(dim)(i => (math.sin(i + 1) * 0.3).toFloat)
    val w = Array.tabulate(dim)(i => (math.cos(2 * i + 1) * 0.2).toFloat)
    val df = Seq((1L, v), (2L, w)).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), col("embedding"),
      ScaleTransforms.permuteEmbedding(col("embedding"), 0, dim).as("e0"),
      ScaleTransforms.permuteEmbedding(col("embedding"), 7, dim).as("e7"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getSeq[Float](2),
        r.getSeq[Float](3)))
      .sortBy(_._1)
    out.foreach { case (_, e, e0, e7) =>
      assert(e0 == e, "c=0 must be identity")
      // signed permutation: same multiset of |values|, exact (negation
      // is exact in IEEE), so norms and within-copy dots are preserved
      assert(e7.map(math.abs).sorted == e.map(math.abs).sorted)
      assert(e7 != e, "c=7 must actually move something")
    }
    // dot product preserved exactly in real arithmetic: check via doubles
    val Seq((_, a, _, a7), (_, b, _, b7)) = out.toSeq
    def dot(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    assert(math.abs(dot(a7, b7) - dot(a, b)) < 1e-12)
  }
}
