package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestBase

/** Property tests for [[Triangles]]: on random simple graphs, the
  * orientation + adjacency-intersection enumeration must agree with a
  * plain-Scala brute-force reference — each triangle found EXACTLY once
  * (the uniqueness of the source under the acyclic (deg, id) orientation
  * is the load-bearing claim; a double-orientation or a tie-breaking bug
  * would double-count, which corpus-level oracle gates could mask if the
  * corpus lacks the triggering degree pattern).
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  // random simple graphs over ≤14 nodes: dense enough that degree ties —
  // the tie-break-by-id path — occur constantly
  private val genEdges: Gen[Set[(Long, Long)]] =
    Gen.listOf(for {
      a <- Gen.chooseNum(1L, 14L)
      b <- Gen.chooseNum(1L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.toSet)

  private def bruteTriangles(es: Set[(Long, Long)]): Set[(Long, Long, Long)] = {
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2)
    val nodes = adj.keys.toSeq.sorted
    (for {
      i <- nodes; j <- nodes if i < j && adj(i)(j)
      k <- nodes if j < k && adj(i)(k) && adj(j)(k)
    } yield (i, j, k)).toSet
  }

  test("enumeration agrees with brute force and emits each triangle once") {
    val prop = Prop.forAll(genEdges) { es =>
      val want = bruteTriangles(es)
      if (es.isEmpty) want.isEmpty
      else {
        val rows = Triangles.of(es.toSeq.toDF("u", "v"), "u", "v")
          .select("a", "b", "c").as[(Long, Long, Long)].collect()
        // normalize corner order (the op emits orientation order, the
        // reference id order) — then demand SET equality AND no dup rows
        val got = rows.map { case (a, b, c) =>
          val s = Seq(a, b, c).sorted; (s(0), s(1), s(2)) }
        got.length == got.toSet.size && got.toSet == want
      }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop).passed)
  }

  test("hub node: a star plus one chord has exactly one triangle; " +
    "adjacency arrays stay bounded by the orientation") {
    // star center 1 with leaves 2..10, chord (2,3): triangle {1,2,3} only
    val es = ((2L to 10L).map(l => (1L, l)) :+ (2L, 3L)).toDF("u", "v")
    val o = Triangles.orient(es, "u", "v")
    val adj = Triangles.adjacency(o)
    val tri = Triangles.enumerate(o, adj).as[(Long, Long, Long)].collect()
    assert(tri.map { case (a, b, c) =>
      val s = Seq(a, b, c).sorted; (s(0), s(1), s(2)) }.toSeq == Seq((1L, 2L, 3L)))
    // the hub (degree 10) is on the RECEIVING end of every orientation:
    // its out-neighborhood must be empty or tiny, never the full star
    val maxAdj = adj.select(max(size(col("nbrs")))).as[Int].head()
    assert(maxAdj <= 2, s"orientation failed to bound the hub: $maxAdj")
  }

  test("clustering coefficient tail (gt4's ppm formula): pure-clique nodes " +
    "hit exactly 1.0, overlap nodes 40/72") {
    // two K6 cliques sharing nodes {4, 5}: a non-overlap node has deg 5 and
    // C(5,2)=10 closed neighbor pairs (cc = 1); an overlap node has deg 9
    // and 20 closed pairs (cc = 40/72 → 555555 ppm under integer division)
    val clique = (lo: Long, hi: Long) =>
      for (u <- lo until hi; v <- u + 1 until hi) yield (u, v)
    val es = (clique(0L, 6L) ++ clique(4L, 10L)).distinct.toDF("u", "v")
    val o = Triangles.orient(es, "u", "v")
    val tri = Triangles.enumerate(o, Triangles.adjacency(o))
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    val cc = o.select(explode(array(col("src"), col("dst"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .join(tri, Seq("n"), "left")
      .select(col("n"), expr(
        "(2000000 * coalesce(n_tri, 0L)) div (deg * (deg - 1))").as("ppm"))
      .as[(Long, Long)].collect().toMap
    for (n <- Seq(0L, 1L, 2L, 3L, 6L, 7L, 8L, 9L))
      assert(cc(n) == 1000000L, s"node $n: ${cc(n)}")
    for (n <- Seq(4L, 5L))
      assert(cc(n) == 555555L, s"node $n: ${cc(n)}")
  }
}
