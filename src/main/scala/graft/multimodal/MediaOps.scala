package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder-prompt first-class extension): image /
  * audio / video travel as opaque BINARY cells with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * batch-shaped partition operators.
  *
  * The Spark-side plumbing — schema, partitioning, executor-singleton
  * decoder, batch iteration shape — is real and tested. The codec itself is
  * STUBBED ([[FakeDecoder]]): this container has no image/audio libraries,
  * so the decoder seam is a trait and the stub is a deterministic fake
  * (bytes → hash-derived "pixels"), exactly the surrogate-model pattern the
  * screening cascade uses (FIXTURES.md §7).
  *
  * Scale shape: decode is a NARROW per-partition op (no shuffle); the
  * decoder loads once per executor via [[ModelRegistry]]; batches amortize
  * per-call overhead the way mapInPandas/Arrow batches do in PySpark. At
  * 100 TB the only wide ops downstream of decode are whatever aggregation
  * the features feed.
  */
object MediaOps {

  /** Typed metadata carried beside the payload (§1.3 nested-struct style). */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       sampleRate: Int, nFrames: Int)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, n_bytes: Int, feature: Seq[Double])

  /** The decoder seam. Real backends (JPEG decode, PCM resample, frame
    * extraction) implement this trait; only the stub ships here.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** STUB: deterministic fake decode — a hash-seeded float vector of the
    * requested size. Stands in for the codec, keeps every test and plan
    * exactly reproducible.
    */
  class FakeDecoder(dim: Int = 16) extends MediaDecoder {
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      var h = 0L
      var i = 0
      while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
      Array.tabulate(dim) { j =>
        val v = (h * (j + 1) + j * 7919L) % 1000L
        v.toFloat / 1000.0f
      }
    }
  }

  /** Build a media table from the documents corpus: UTF-8 payload bytes +
    * synthesized typed metadata (the corpus has no real blobs; the byte
    * path is identical either way).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 12).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") % 30 + 1).cast("int").as("nFrames")).as("meta"))

  /** Batched decode + feature extraction: the Scala analog of a Pandas UDF
    * over mapInPandas — mapPartitions iterates the partition in batch,
    * fetching the decoder once per executor (not per row/batch).
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow],
                     decoderDim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // executor-singleton fetch (M2 pattern): one decoder per JVM, not per
      // row or partition
      val decoder = MediaOps.decoderSingleton(decoderDim)
      rows.map { r =>
        val f = decoder.decode(r.payload, r.meta)
        MediaFeatures(r.media_id, r.payload.length, f.map(_.toDouble).toSeq)
      }
    }
  }

  @transient private lazy val decoders =
    new java.util.concurrent.ConcurrentHashMap[Int, MediaDecoder]()
  def decoderSingleton(dim: Int): MediaDecoder =
    decoders.computeIfAbsent(dim, d => new FakeDecoder(d))

  /** Frame sampling for video-ish payloads: every k-th frame index from the
    * metadata — pure column math, no decode needed.
    */
  def sampleFrameIndices(meta: Column, every: Int): Column =
    filter(sequence(lit(0), meta.getField("nFrames") - 1),
      i => i % every === 0)

  /** "Resize" plan-side: target dims recorded in metadata; the actual pixel
    * work happens inside the decode partition op at scale.
    */
  def withResizedMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.kind").as("kind"), lit(w).as("width"), lit(h).as("height"),
      col("meta.sampleRate").as("sampleRate"), col("meta.nFrames").as("nFrames")))
}
