package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index = [[Similarity.ivfTopK]]'s inverted lists written
  * as a hive-partitioned table on the centroid id ([[Layout]]), so a probe
  * touches only its `nprobe` partitions' files on disk.
  *
  * The probe joins the index on its partition column against a small
  * (broadcast) probe-list side — exactly the shape Spark's DYNAMIC
  * partition pruning exists for: the scan's PartitionFilters gain a
  * `dynamicpruningexpression(cid IN ...)` fed from the broadcast, and
  * non-probed inverted lists are never read. At a billion vectors the
  * index is the compact (cid, id, vec) table and probe I/O is
  * |probed lists|, not |corpus| — the storage-side complement to
  * ivfTopK's compute-side fan-out bound. AnnIndexSpec pins value-equality
  * with the unpersisted ivfTopK and the dynamic-pruning plan.
  */
object AnnIndex {

  /** Assign every vector to its nearest centroid (same scoring + argmin
    * tie-break as ivfTopK) and persist lists partitioned by `cid`.
    */
  def buildIvf(emb: DataFrame, id: String, vec: String,
               centroids: DataFrame, path: String): Unit = {
    val scored = Dedup.parallelize(emb.select(col(id), col(vec)))
      .crossJoin(broadcast(centroids))
      .select(col(id), col(vec), col("cid"),
        Similarity.cosine(col(vec), col("cv")).as("ccos"))
    val byVec = Window.partitionBy(col(id)).orderBy(col("ccos").desc, col("cid"))
    val assign = scored.withColumn("crn", row_number().over(byVec))
      .filter(col("crn") === 1)
      .select(col("cid"), col(id).as("neighbor_id"), col(vec).as("nv"))
    Layout.writePartitioned(assign, path, "cid")
  }

  /** Probe the persisted lists: rank centroids per query, read only the
    * top-`nprobe` lists (dynamic partition pruning via the broadcast probe
    * side), exact cosine re-rank, top `k`.
    */
  def probeIvf(spark: SparkSession, path: String,
               queries: DataFrame, id: String, vec: String,
               centroids: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val qScored = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cid"),
        Similarity.cosine(col("qv"), col("cv")).as("ccos"))
    val byQ = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = qScored.withColumn("crn", row_number().over(byQ))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    val idx = Layout.read(spark, path)
    val cands = idx.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("nv")).as("cos"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= k)
  }
}
