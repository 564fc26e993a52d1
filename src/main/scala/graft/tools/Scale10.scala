package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** 10× scale-up harness (PLANS.md "10× scale-up measurement"): replicate
  * the sf0.1 corpus 10× with the honest per-copy transforms of
  * [[ScaleTransforms]] — length-preserving caesar text remap (cross-copy
  * shingles never collide, so dedup sees a real 10×, not a 10-clique),
  * signed embedding-dimension permutation (within-copy geometry
  * preserved, cross-copy cosines decorrelated), disjoint id/user spaces
  * for events —
  * write it with the same 32-file layout, then time the given registry
  * queries at both scales (3 reps, prints each).
  *
  * Usage: Scale10 [query ...]  (default: the round-4 additions)
  */
object Scale10 {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/scale10"
    val copies = 10
    val queries = if (args.nonEmpty) args.toSeq else Seq(
      "d11_semdedup_apply", "t15_curriculum", "t16_outlier_filter",
      "t14_source_mixture", "c5_histogram", "e8_interval_join_outer")
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docStride = docs.agg(max("doc_id")).first().getLong(0) + 1
    (0 until copies).map { c =>
      docs.select((col("doc_id") + lit(c * docStride)).as("doc_id"),
        ScaleTransforms.remapText(col("text"), c).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val vecStride = emb.agg(max("vec_id")).first().getLong(0) + 1
    (0 until copies).map { c =>
      emb.select((col("vec_id") + lit(c * vecStride)).as("vec_id"),
        ScaleTransforms.permuteEmbedding(col("embedding"), c,
          graft.queries.SimilarityQueries.DIM).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = spark.read.parquet(s"$base/events.parquet")
    val evStride = ev.agg(max("event_id")).first().getLong(0) + 1
    val userStride = ev.agg(max("user_id")).first().getLong(0) + 1
    (0 until copies).map { c =>
      ev.select((col("event_id") + lit(c * evStride)).as("event_id"),
        col("ts"), (col("user_id") + lit(c * userStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    for (q <- queries; (label, dir) <- Seq("x1" -> base, "x10" -> out)) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale10] $q $label: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
