package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the packed-register hyperball propagation (r12, [[HllRegs]]) to
  * the sparse reference spelling it replaced: same registers, same
  * estimator integers, on a deterministic random graph shaped like the
  * gate corpus (bipartite-ish hubs, so round 2 actually exercises the
  * saturated-register merge path the pack exists for).
  */
class HllRegsSpec extends SparkTestBase {

  // deterministic LCG edges: ~hub-skewed bipartite graph, ids < 2^31
  private def graph(): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(42)
    val edges = (0 until 4000).map { _ =>
      val c = rnd.nextInt(300) * 2L
      val ss = rnd.nextInt(40) * 2L + 1
      (c, ss)
    }.distinct
    val dir = edges ++ edges.filter(_._1 % 6 == 0).map(e => (e._2, e._1))
    import spark.implicits._
    val e = dir.toDF("src", "dst")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    (e, nodes)
  }

  private def h = StableHash.polyHash64(
    concat(lit("n"), col("id").cast("string")))

  /** The pre-r12 sparse spelling, verbatim. */
  private def sparseRegs(e: DataFrame, nodes: DataFrame): DataFrame = {
    val r0 = nodes.select(col("id"),
      Hll.regCol(h).as("reg"), Hll.rhoCol(h).as("rho"))
    def propagate(r: DataFrame): DataFrame =
      r.unionAll(
          e.join(r.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
            .select(col("src").as("id"), col("reg"), col("rho")))
        .groupBy("id", "reg").agg(max(col("rho")).as("rho"))
    propagate(propagate(r0))
  }

  private def packedRegs(e: DataFrame, nodes: DataFrame): DataFrame = {
    val r0 = nodes.select(col("id"),
      Hll.regCol(h).as("reg"), Hll.rhoCol(h).cast("int").as("rho"))
    val r1 = r0.unionAll(
        e.join(r0.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
          .select(col("src").as("id"), col("reg"), col("rho")))
      .groupBy("id")
      .agg(HllRegs.initRegs(col("reg"), col("rho")).as("regs"))
      .localCheckpoint()
    r1.unionAll(
        e.join(r1.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
          .select(col("src").as("id"), col("regs")))
      .groupBy("id").agg(HllRegs.maxRegs(col("regs")).as("regs"))
  }

  test("packed two-round propagation reproduces the sparse registers " +
    "exactly (every node, every register)") {
    val (e, nodes) = graph()
    val sparse = sparseRegs(e, nodes).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getInt(2))
      .toMap
    val packed = packedRegs(e, nodes).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("regs")).toMap
    assert(packed.nonEmpty)
    val sparseIds = sparse.keys.map(_._1).toSet
    assert(packed.keySet == sparseIds, "node sets differ")
    for ((id, regs) <- packed) {
      assert(regs.length == Hll.M)
      for (i <- 0 until Hll.M) {
        val want = sparse.getOrElse((id, i), 0)
        assert(regs(i).toInt == want,
          s"node $id register $i: packed ${regs(i)} vs sparse $want")
      }
    }
  }

  test("stats expression packs the sparse readout's exact integers " +
    "(ssum = sp + zeros*MaxTerm, used)") {
    val (e, nodes) = graph()
    val viaSparse = sparseRegs(e, nodes).groupBy("id").agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${Hll.W + 1} - rho)"))
          .as("sp"),
        count(lit(1)).as("used"))
      .select(col("id"), col("used"),
        (col("sp") + (lit(Hll.M.toLong) - col("used")) * lit(Hll.MaxTerm))
          .as("ssum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaPacked = packedRegs(e, nodes)
      .select(col("id"), HllRegs.stats(col("regs")).as("st"))
      .collect().map { r =>
        val st = r.getLong(1)
        r.getLong(0) -> (st & 511L, st >> 9)
      }.toMap
    assert(viaPacked == viaSparse)
  }

  test("merge path: bytewise max across shuffled partitions equals the " +
    "single-partition fold") {
    val (e, nodes) = graph()
    val wide = packedRegs(e.repartition(16), nodes).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("regs").toSeq).toMap
    val narrow = packedRegs(e.coalesce(1), nodes).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("regs").toSeq).toMap
    assert(wide == narrow)
  }
}
