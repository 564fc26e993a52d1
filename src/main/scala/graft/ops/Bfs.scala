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
  * Each round's frontier is materialized EAGERLY (localCheckpoint) before
  * the next round references it (r11, guide §2.4/§5): round h's frontier
  * feeds BOTH round h+1's semi-join and every later round's anti-join via
  * the growing visited union, so a fully lazy unroll re-evaluates round
  * 1's subtree up to 8 times at 3 hops (ReuseExchange dedupes the
  * shuffles but every reduce-side distinct/anti-join and broadcast build
  * re-runs per reference — measured 6.45 s → 2.32 s on gr4 at sf0.1).
  * The checkpointed frames are O(frontier) node-scale rows, built fresh
  * on every invocation (no CacheManager entry — a lazy `.persist()` here
  * would let bench iteration 2 silently read iteration 1's cache, the
  * cross-run memo the bench protocol forbids). Callers still own the
  * `edges` lifecycle; the returned frame is a cheap union of the
  * checkpointed rounds.
  */
object Bfs {

  /** BFS reach: `edges` has columns (src, dst), `seeds` a single column
    * `id`. Seeds outside the graph are the caller's concern (semi-join
    * them against the node set first if phantom seeds are possible).
    * Executes `maxHops` eager node-scale jobs at call time (see above).
    */
  def reach(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    var visited = seeds.select(col("id")).withColumn("hops", lit(0))
    var frontier = seeds.select(col("id"))
    for (h <- 1 to maxHops) {
      frontier = edges
        .join(frontier.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint() // eager: one edge semi-join per round, ever
      visited = visited.unionByName(frontier.withColumn("hops", lit(h)))
    }
    visited
  }
}
