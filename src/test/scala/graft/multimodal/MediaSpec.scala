package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.multimodal.MediaOps._

class MediaSpec extends SparkTestBase {
  import spark.implicits._

  private def mediaDs = {
    val docs = Seq(
      (0L, "hello world", 11L), (1L, "audio bytes here", 16L),
      (2L, "zz", 2L), (3L, "frame frame frame", 17L))
      .toDF("doc_id", "text", "n_chars")
    mediaFromDocuments(docs).as[MediaRow]
  }

  test("media table: binary payload + typed metadata struct") {
    val rows = mediaDs.collect().sortBy(_.media_id)
    assert(rows.length == 4)
    assert(new String(rows(0).payload, "UTF-8") == "hello world")
    assert(rows(0).meta.kind == "image" && rows(1).meta.kind == "audio")
  }

  test("batched decode: deterministic features, schema preserved") {
    val f1 = decodeFeatures(spark, mediaDs).collect().sortBy(_.media_id)
    val f2 = decodeFeatures(spark, mediaDs).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(_.feature.size == 16))
    assert(f1.forall(f => f.feature.forall(v => v >= 0.0 && v < 1.0)))
    assert(f1.map(_.n_bytes).toSeq == Seq(11, 16, 2, 17))
  }

  test("decode is a narrow op: partitioning preserved, no shuffle") {
    val ds = mediaDs.repartition(3)
    val out = decodeFeatures(spark, ds)
    assert(out.rdd.getNumPartitions == 3)
    val plan = out.queryExecution.executedPlan.toString
    // exactly ONE exchange — the repartition(3) above; decode adds none
    val exchanges = plan.split("\n").count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges == 1, s"decode should not add a shuffle:\n$plan")
  }

  test("decoder is an executor singleton per dim") {
    val a = decoderSingleton(16); val b = decoderSingleton(16)
    assert(a eq b)
    assert(!(decoderSingleton(8) eq a))
  }

  test("frame sampling picks every k-th index from metadata") {
    val out = mediaDs.toDF()
      .select(col("media_id"), sampleFrameIndices(col("meta"), 3).as("idx"))
      .as[(Long, Seq[Int])].collect().toMap
    // doc 3: n_chars=17 → nFrames=18 → indices 0,3,...,15 → 6 samples
    assert(out(3L) == Seq(0, 3, 6, 9, 12, 15))
  }

  test("resize records target dims in metadata") {
    val out = withResizedMeta(mediaDs.toDF(), 224, 224).as[MediaRow].collect()
    assert(out.forall(r => r.meta.width == 224 && r.meta.height == 224))
  }
}
