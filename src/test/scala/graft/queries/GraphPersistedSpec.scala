package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins gr4b/gr7b's invalidation rule: the composite two-table content key
  * ([[GraphQueries.graphEdgesKey]]) must change under ANY mutation of the
  * columns the persisted edge/register bases derive from — including
  * `l_returnflag`, which only affects back-edges (a stale store would
  * silently serve a graph missing a returned line's reverse edge) — and
  * must NOT change under row reorder or mutations of non-key columns.
  */
class GraphPersistedSpec extends SparkTestBase {
  import spark.implicits._

  // a tiny two-table corpus materialized as a real sfDir (graphEdgesKey
  // reads through graft.Tables, so the fixture goes through parquet)
  private def writeCorpus(dir: String, flagOf: Long => String,
                          shuffled: Boolean = false,
                          priceBump: Boolean = false): Unit = {
    val o = Seq((1L, 10L, 100.0), (2L, 11L, 200.0), (3L, 10L, 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val l = Seq((1L, 5L, 1.0), (2L, 6L, 2.0), (3L, 5L, 3.0))
      .toDF("l_orderkey", "l_suppkey", "l_quantity")
      .withColumn("l_returnflag",
        udf(flagOf).apply(col("l_orderkey")))
      .withColumn("l_quantity",
        if (priceBump) col("l_quantity") + lit(9.0) else col("l_quantity"))
    val ord = if (shuffled) o.orderBy(col("o_orderkey").desc) else o
    ord.coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = if (shuffled) l.orderBy(col("l_orderkey").desc) else l
    li.coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("graphEdgesKey: stable under row reorder and non-key mutations, " +
    "invalidated by a returnflag flip") {
    val base = java.nio.file.Files.createTempDirectory("gpspec").toString
    writeCorpus(s"$base/a", k => if (k == 2L) "R" else "N")
    writeCorpus(s"$base/b", k => if (k == 2L) "R" else "N", shuffled = true)
    writeCorpus(s"$base/c", k => if (k == 2L) "R" else "N", priceBump = true)
    writeCorpus(s"$base/d", k => if (k == 3L) "R" else "N") // flag flip
    val ka = GraphQueries.graphEdgesKey(spark, s"$base/a")
    assert(ka == GraphQueries.graphEdgesKey(spark, s"$base/b"),
      "row order must not change the key")
    assert(ka == GraphQueries.graphEdgesKey(spark, s"$base/c"),
      "a non-key column (l_quantity) must not change the key")
    assert(ka != GraphQueries.graphEdgesKey(spark, s"$base/d"),
      "a returnflag flip changes the back-edge set and MUST invalidate")
  }

  test("graphEdgesKey: distinguishes which table changed") {
    val base = java.nio.file.Files.createTempDirectory("gpspec2").toString
    writeCorpus(s"$base/a", _ => "N")
    // same lineitem, different orders (custkey retarget)
    writeCorpus(s"$base/b", _ => "N")
    spark.read.parquet(s"$base/a/orders.parquet")
      .withColumn("o_custkey",
        when(col("o_orderkey") === 1L, lit(12L)).otherwise(col("o_custkey")))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/b/orders.parquet")
    val ka = GraphQueries.graphEdgesKey(spark, s"$base/a")
    val kb = GraphQueries.graphEdgesKey(spark, s"$base/b")
    assert(ka != kb, "an o_custkey retarget must invalidate")
    // the lineitem half of the composite key is unchanged — the key is
    // "ordersKey.lineitemKey", so the suffix after the first '.' agrees
    assert(ka.split('.')(1) == kb.split('.')(1),
      "an orders-only change must leave the lineitem fingerprint intact")
  }
}
