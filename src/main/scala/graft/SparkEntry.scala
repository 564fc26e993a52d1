package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query registry is assembled from per-module packs; each pack pairs
  * Spark implementations (SURVEY §2 operator inventory) with DuckDB oracle
  * SQL over the same parquet corpus. Keys are stable operator ids.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    FilterQueries, GroupedQueries, JoinQueries, FanoutQueries, ScalarQueries,
    TextQueries, DedupQueries, SimilarityQueries, EventQueries, PipelineQueries,
    MultimodalQueries, DomainQueries, ParityQueries, AsOfQueries, CubeQueries,
    RangeQueries, WindowQueries, GraphQueries, TpchQueries, TpchQueries2,
    StatsQueries, SketchQueries, PrivacyQueries, MiningQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full screening-pipeline shape: fan-out, broadcast cross join,
    * surrogate cascade, grouped soft-delete (see PipelineQueries).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("m5_pipeline_screen")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    val dups = all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query ids across packs (toMap would silently drop one): ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
