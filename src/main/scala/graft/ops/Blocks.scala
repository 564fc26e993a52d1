package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle helper for `localCheckpoint`'d frames in iterative loops.
  *
  * Checkpoint blocks stay cached until explicitly unpersisted; an
  * iterative operator that checkpoints per round (connected components,
  * k-means) would otherwise accumulate every round's blocks for the life
  * of the session. Loops call [[unpersist]] on each superseded frame once
  * its successor is materialized; the final frame is left cached for the
  * caller's lazy plan and reclaimed by the ContextCleaner when
  * dereferenced.
  */
private[graft] object Blocks {

  /** Free the checkpoint blocks backing `df` (no-op for un-checkpointed
    * frames). Non-blocking: eviction proceeds asynchronously.
    *
    * `df` must be a checkpoint ROOT (the checkpointed frame itself, or a
    * narrow projection over exactly one) — on a frame that merely
    * references several checkpointed inputs, freeing "the first one found"
    * could destroy unrecomputable data a still-live sibling plan needs
    * (localCheckpoint truncates lineage; there is nothing to recompute
    * from). Enforced, not just documented.
    */
  def unpersist(df: DataFrame): Unit = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }
    require(rdds.size <= 1,
      s"Blocks.unpersist expects a checkpoint root; found ${rdds.size} checkpointed inputs")
    rdds.foreach(_.unpersist(blocking = false))
  }
}
