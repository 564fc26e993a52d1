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
    */
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
