package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("persisted IVF probe equals the unpersisted ivfTopK result") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val cent = emb.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    AnnIndex.buildIvf(emb, "vec_id", "embedding", cent, path)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val got = AnnIndex.probeIvf(spark, path, queries, "vec_id", "embedding",
        cent, nprobe = 2, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.ivfTopK(emb, "vec_id", "embedding",
        col("vec_id") % 100 === 7, col("vec_id") % 50 === 0,
        nprobe = 2, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want)
  }

  test("probe scan carries a dynamic partition-pruning filter") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf2").toString
    val cent = emb.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    AnnIndex.buildIvf(emb, "vec_id", "embedding", cent, path)
    val queries = emb.filter(col("vec_id") === 0)
    val q = AnnIndex.probeIvf(spark, path, queries, "vec_id", "embedding",
      cent, nprobe = 2, k = 5)
    val n = q.collect().length // execute so the final adaptive plan exists
    assert(n > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the index scan:\n$plan")
  }
}
