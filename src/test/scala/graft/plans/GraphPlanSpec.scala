package graft.plans

import graft.{SparkEntry, SparkTestBase}
import graft.ops.Triangles
import org.apache.spark.sql.DataFrame

/** Pins the graph family's size-switched join strategy (r6 verdict item
  * #1): the degree / keep-set frames are |V|-row — at 100 TB a node table
  * is billions of rows and a STATIC broadcast hint would die at plan
  * time, so the joins are deliberately unhinted and AQE switches at
  * runtime on real sizes. Small tier: the frames fit under
  * `spark.sql.adaptive.autoBroadcastJoinThreshold` and convert to
  * broadcast-hash. Node-scale tier (emulated here by turning both
  * broadcast thresholds off): the SAME code runs keyed joins riding the
  * edge partitioning — no BroadcastExchange anywhere — and produces
  * identical rows.
  */
class GraphPlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Deterministic test graph with known triangle structure: two
    * overlapping cliques K6 on {0..5} and {4..9} — dense enough that the
    * degree orientation and the adjacency intersection both do real work.
    */
  private def edgeDf: DataFrame = {
    import spark.implicits._
    val clique = (lo: Int, hi: Int) =>
      for (u <- lo until hi; v <- u + 1 until hi) yield (u.toLong, v.toLong)
    (clique(0, 6) ++ clique(4, 10)).distinct.toDF("u", "v")
  }

  /** Runs `body` with every broadcast tier disabled — the static planner's
    * threshold AND AQE's runtime one — emulating a node table too big to
    * broadcast at any stage.
    */
  private def withNoBroadcast[T](body: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try { keys.foreach(spark.conf.set(_, "-1")); body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes the adaptive plan only during execution
    df.queryExecution.executedPlan.toString
  }

  /** Class names of every operator the query EXECUTES, unwrapping AQE
    * stages. An `InMemoryRelation`'s stored build plan is deliberately
    * excluded (it is a field of the table scan, not a child): a memoized
    * base built earlier — possibly with broadcasts, at its own tier — is
    * read as cached bytes here, so its build-time operators are not part
    * of the tier under test. (The r11 tri_base persist() surfaced this:
    * the plan STRING embeds the cached build subtree.)
    */
  private def executedNodeNames(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    df.collect()
    def walk(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => q.getClass.getSimpleName +: walk(q.plan)
      case r: ReusedExchangeExec => r.getClass.getSimpleName +: walk(r.child)
      case other =>
        other.getClass.getSimpleName +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("triangle orientation at node scale: degree joins degrade to keyed " +
    "joins — no broadcast of the |V|-row frame — with identical triangles") {
    val expected = Triangles.of(edgeDf, "u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // K6 has C(6,3)=20 triangles; the cliques overlap on only 2 nodes, so
    // no triangle lies in both and none spans them: 40 total
    assert(expected.size == 2 * 20, s"fixture sanity: ${expected.size}")
    withNoBroadcast {
      val df = Triangles.of(edgeDf, "u", "v")
      val p = finalPlan(df)
      assert(!p.contains("BroadcastExchange") && !p.contains("BroadcastHashJoin")
          && !p.contains("BroadcastNestedLoop"),
        "node-scale tier must not broadcast:\n" +
          p.linesIterator.filter(_.contains("Join")).mkString("\n"))
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    }
  }

  test("gt3 k-core peel at node scale: keep-set semi-joins ride the edge " +
    "partitioning — no broadcast — with identical core") {
    val name = "gt3_kcore_peel"
    val expected = SparkEntry.queries(name)(spark, sf).collect().toSeq
    withNoBroadcast {
      val df = SparkEntry.queries(name)(spark, sf)
      val nodes = executedNodeNames(df)
      assert(!nodes.exists(_.startsWith("Broadcast")),
        "node-scale tier must not broadcast:\n" +
          nodes.filter(_.contains("Join")).mkString("\n"))
      assert(df.collect().toSeq == expected)
    }
  }

  test("BFS reach at node scale: frontier/visited joins ride the edge " +
    "partitioning — no broadcast of a node-scale frame — identical reach") {
    import spark.implicits._
    // directed path 0→1→2→3→4 plus a side branch 1→5: hop structure is
    // known exactly and hop 3 must NOT include 4 (it is 4 hops out)
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val expected = Set((0L, 0), (1L, 1), (2L, 2), (5L, 2), (3L, 3))
    def reach(): Set[(Long, Int)] =
      graft.ops.Bfs.reach(e, seeds, 3).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(reach() == expected, "fixture sanity (small tier)")
    withNoBroadcast {
      val df = graft.ops.Bfs.reach(e, seeds, 3)
      val p = finalPlan(df)
      assert(!p.contains("BroadcastExchange") && !p.contains("BroadcastHashJoin")
          && !p.contains("BroadcastNestedLoop"),
        "node-scale tier must not broadcast:\n" +
          p.linesIterator.filter(_.contains("Join")).mkString("\n"))
      assert(reach() == expected)
    }
  }

  test("small tier still broadcasts: AQE converts the degree joins at " +
    "runtime when the frame fits the threshold") {
    val p = finalPlan(Triangles.of(edgeDf, "u", "v"))
    assert(p.contains("BroadcastHashJoin"),
      "small-tier degree join should convert to broadcast:\n" +
        p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }
}
