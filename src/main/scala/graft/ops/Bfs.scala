package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS reach over a directed edge list — the fixed-depth
  * traversal member of the iterative-graph family (pagerank, triangles,
  * CC, label propagation). Emits (id, hops) with the MINIMUM hop count
  * ≤ `maxHops` for every node reachable from the seed set.
  *
  * Scale contract: per round, ONE semi-join of the edge table against the
  * current frontier (keyed on src — callers persist the edge table
  * partitioned by src so every round rides the same layout) plus one
  * anti-join against the visited set. Frontier and visited are node-scale
  * frames and therefore deliberately UNHINTED ([[Triangles.orient]]
  * discipline): AQE converts them to broadcast at runtime while they fit
  * under `spark.sql.adaptive.autoBroadcastJoinThreshold` and keys the
  * joins on the edge partitioning above it, so the committed plan
  * survives a frontier too big to broadcast. GraphPlanSpec pins the
  * node-scale tier.
  *
  * Returned plan is LAZY and references `edges` once per round — callers
  * that execute it more than once (or at all, beyond trivial graphs)
  * should persist `edges` and release it behind an eager checkpoint of
  * the O(reached) result (gr1 lifecycle; see gr4 in GraphQueries).
  */
object Bfs {

  /** BFS reach: `edges` has columns (src, dst), `seeds` a single column
    * `id`. Seeds outside the graph are the caller's concern (semi-join
    * them against the node set first if phantom seeds are possible).
    */
  def reach(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    var visited = seeds.select(col("id")).withColumn("hops", lit(0))
    var frontier = seeds.select(col("id"))
    for (h <- 1 to maxHops) {
      frontier = edges
        .join(frontier.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
      visited = visited.unionByName(frontier.withColumn("hops", lit(h)))
    }
    visited
  }
}
