package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) — the fourth member
  * of the iterative-graph family (pagerank, triangles/k-core, connected
  * components). Deterministic variant: every node starts as its own label;
  * each round it adopts the MOST FREQUENT label among its neighbors, ties
  * broken by the smallest label — argmax-with-total-tie-order, so the
  * fixed unroll evaluates to the identical result on any engine and any
  * partitioning (classic async LPA is order-dependent by design; the
  * synchronous tie-ordered form is the reproducible one a pipeline wants).
  */
object LabelProp {

  /** `iters` synchronous LPA rounds over a SYMMETRIC, distinct edge list
    * with columns (a, b). Returns (id, lbl) for every node with ≥1 edge.
    *
    * Scale contract (pagerank discipline): the edge table shuffles ONCE —
    * repartitioned by the probe side `b` and persisted, so each round
    * reshuffles only the O(|V|) label table against it. The per-round
    * tail pays ONE exchange on `a`: hash partitioning by `a` satisfies
    * the (a, lbl) count's clustering (subset rule) AND the argmax
    * window's, so the aggregate and the window ride the same layout.
    *
    * Lifecycle (CC discipline, not gr1's bounded-by-GC): the final label
    * table is eagerly localCheckpoint'ed (it is O(|V|) — small) and the
    * O(|E|) edge cache is released INSIDE the call. The first sf1 bench
    * that carried gr2's lingering edge cache into the triangle family
    * measured gt2 at 5-6× its usual time: a big persist that waits for GC
    * is a real memory tax on whatever runs next in the session.
    */
  def propagate(sym: DataFrame, iters: Int): DataFrame = {
    val e = sym.select(col("a"), col("b")).repartition(col("b")).persist()
    var labels = e.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
    for (_ <- 1 to iters) {
      val w = Window.partitionBy("a").orderBy(col("n").desc, col("lbl").asc)
      labels = e.join(labels, col("b") === col("id"))
        .select(col("a"), col("lbl"))
        .repartition(col("a"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("n"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("a").as("id"), col("lbl"))
    }
    // sever lineage off the edge cache; release the cache even when the
    // eager checkpoint job fails — an exception here would otherwise pin
    // the O(|E|) blocks for the rest of the session (Bench catches per
    // query and keeps going)
    try labels.localCheckpoint(true)
    finally e.unpersist()
  }
}
