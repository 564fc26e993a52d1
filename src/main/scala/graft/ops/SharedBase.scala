package graft.ops

import org.apache.spark.sql.SparkSession

/** Keyed cache-and-release memo for expensive shared bases — the
  * checkpointed intermediates a FAMILY of queries reuses (the triangle
  * family's oriented edge list + adjacency arrays, the dedup family's
  * connected-component labels). Index-build discipline: built once per
  * (session, data dir), shared by every family member and every bench
  * iteration; building for a NEW key releases the superseded value first,
  * so a long-lived session holds exactly one copy — the invariant
  * BlocksSpec pins (round 5 measured the alternative: per-invocation
  * checkpoints that were never unpersisted accumulated in the block
  * manager and their GC pressure inflated UNRELATED queries' timings).
  *
  * `release` is skipped when the superseded entry's session is already
  * stopped (its blocks died with the context). Keyed by session identity
  * so suites with independent sessions never cross-release each other's
  * blocks.
  */
private[graft] final class SharedBase[V](build: (SparkSession, String) => V,
                                         release: V => Unit) {
  private var cache: Option[((SparkSession, String), V)] = None

  def get(s: SparkSession, d: String): V = synchronized {
    val key = (s, d)
    cache match {
      case Some((k, v)) if k == key => v
      case prev =>
        prev.foreach { case ((ps, _), v) =>
          if (!ps.sparkContext.isStopped) release(v) }
        val v = build(s, d)
        cache = Some((key, v))
        v
    }
  }
}
