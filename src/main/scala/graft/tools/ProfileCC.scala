package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** Stage-level timing for the d7/d8 hotspot (LSH pairs → connected
  * components): prints wall seconds per phase so per-round fixed costs are
  * visible separately from the candidate-generation cost.
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    // warmup the scan + shingle chain
    t("warmup pairs")(Dedup.lshPairs(docs, "doc_id", col("text"), 5, 16, 1).count())
    val pairs = t("pairs (count)") {
      val p = Dedup.lshPairs(docs, "doc_id", col("text"), 5, 16, 1)
      p.count(); p
    }
    t("cc")(Dedup.connectedComponents(docs, pairs, "doc_id", "id1", "id2")
      .count())
    t("cc again")(Dedup.connectedComponents(docs, pairs, "doc_id", "id1", "id2")
      .count())
    spark.stop()
  }
}
