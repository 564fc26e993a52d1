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
}
