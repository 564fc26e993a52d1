package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Pins the documented physical-plan shapes (PLANS.md) for queries whose
  * scale story depends on a specific join strategy — a silent fallback
  * from broadcast to shuffle would still pass the correctness gate but
  * lose the plan we designed for.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("e7 enrich: dim side broadcast, fact side never shuffled before the join") {
    val p = plan("e7_stream_static_enrich")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("t12 term-df: vocabulary stats broadcast back to the token stream") {
    val p = plan("t12_term_df_score")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("sim7: candidate generation is a broadcast join on (tbl, bucket)") {
    val p = plan("sim7_lsh_multitable")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }
}
