package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain.Bulk

/** SURVEY §2.1 sources/sinks, Spark-native.
  *
  * S1  bulk JSON → `spark.read.schema(...).json` (distributed, schema'd —
  *     the Monty "@class/@module" revival becomes plain nested structs).
  * S5  NPZ id/energy arrays → melt wide array columns into join-ready rows
  *     (the hand-rolled lookup join J4 becomes a real equi-join).
  * S6  ASE trajectory files → `binaryFile` source + a parse seam (stubbed
  *     deterministically; the real parser drops in behind the same trait).
  * S7/S8 LMDB KV side-store → a parquet lookup table + broadcast left join
  *     (point lookups become a map-side join; miss-backfill is a separate
  *     job, never a network callout inside tasks).
  *
  * Parquet result sinks (S9/S10) are native `df.write.parquet`; run-config
  * provenance (S11) is [[writeProvenance]].
  */
object Sources {

  /** S1: schema'd distributed JSON read of the bulk table
    * (load_bulk_structures.py:19-40 reads it single-process).
    */
  def readBulksJson(spark: SparkSession, path: String): Dataset[Bulk] = {
    import spark.implicits._
    spark.read.schema(Encoders.product[Bulk].schema).json(path).as[Bulk]
  }

  /** S5: melt parallel array columns (ids[i] ↔ energies[i]) into rows —
    * the npz shape of parity/data_processing_utils.py:9-72. `arrays_zip`
    * keeps the positional correspondence; explode is narrow.
    */
  def meltArrays(df: DataFrame, distCol: String, idsCol: String,
                 energiesCol: String): DataFrame =
    df.select(col(distCol).as("distribution"),
        explode(arrays_zip(col(idsCol), col(energiesCol))).as("z"))
      .select(col("distribution"), col(s"z.$idsCol").as("id"),
        col(s"z.$energiesCol").as("ml_energy"))

  /** S5: REAL .npz read, distributed — one binaryFile task per archive,
    * [[Npz.readNpz]] parses members in plain JVM code, and the positional
    * id/energy arrays melt into join-ready rows (the numpy.load + zip()
    * of parity/data_processing_utils.py:9-72). File-level parallelism is
    * the right grain: archives are small-per-file, many-per-run.
    */
  def readNpzParity(spark: SparkSession, dir: String,
                    idsKey: String = "ids",
                    energiesKey: String = "energies"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.npz").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val arrays = Npz.readNpz(bytes)
        def need(k: String) = arrays.getOrElse(k,
          throw new IllegalArgumentException(s"$path: no '$k' member"))
        val ids = need(idsKey) match {
          case Npz.NpStrings(_, d) => d.toSeq
          case Npz.NpLongs(_, d)   => d.map(_.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"$path: '$idsKey' has unsupported type $other")
        }
        val energies = need(energiesKey) match {
          case Npz.NpDoubles(_, d) => d.toSeq
          case Npz.NpLongs(_, d)   => d.map(_.toDouble).toSeq
          case other => throw new IllegalArgumentException(
            s"$path: '$energiesKey' has unsupported type $other")
        }
        require(ids.size == energies.size,
          s"$path: ids(${ids.size}) and energies(${energies.size}) differ")
        ids.zip(energies).map { case (id, e) => (path, id, e) }
      }
      .toDF("distribution", "id", "ml_energy")
  }

  /** S6 parse seam: bytes of one trajectory file → per-frame energies +
    * health flag (ProcessValTraj, parity/data_processing_utils.py:75-141).
    */
  trait TrajParser extends Serializable {
    def parse(path: String, bytes: Array[Byte]): TrajRecord
  }
  case class TrajRecord(path: String, energies: Seq[Double], goodTrajectory: Boolean)

  /** STUB parser — deterministic from content; kept for synthetic tests of
    * the plumbing. The real default is [[UlmTraj.Parser]].
    */
  object FakeTrajParser extends TrajParser {
    def parse(path: String, bytes: Array[Byte]): TrajRecord = {
      var h = 0L
      bytes.foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      val n = (h % 5 + 2).toInt
      val energies = (0 until n).map(i => ((h * (i + 1)) % 6000) / 1000.0 - 4.0)
      TrajRecord(path, energies, goodTrajectory = h % 7 != 0)
    }
  }

  /** S6: glob a directory of trajectory files distributed via the
    * binaryFile source; parse per file ([[UlmTraj.Parser]] reads the real
    * ASE ULM container).
    */
  def readTrajectories(spark: SparkSession, dir: String,
                       parser: TrajParser = UlmTraj.Parser): Dataset[TrajRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.traj").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) => parser.parse(p, bytes) }
  }

  /** S6: frame-level trajectory read — one row per frame with the typed
    * structure, for downstream anomaly/energy analysis without re-parsing.
    * Per-file fault tolerance matches [[UlmTraj.Parser]]: one corrupt file
    * in a 10,000-trajectory corpus contributes zero rows instead of
    * aborting the job after task retries.
    */
  def readTrajectoryFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.traj").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val fs = try UlmTraj.frames(bytes)
                 catch { case _: Exception => Seq.empty[UlmTraj.TrajFrame] }
        fs.map { f =>
          (p, f.index, f.energy, f.numbers.size, f.tags, UlmTraj.toStructure(f))
        }
      }
      .toDF("path", "frame", "energy", "natoms", "tags", "structure")
  }

  /** S7: KV side-store probe as a broadcast left join (the LMDB Pourbaix
    * store, filter_utils.py:87-119,194-268).
    */
  def kvLookup(df: DataFrame, lookup: DataFrame, key: String): DataFrame =
    df.join(broadcast(lookup), Seq(key), "left")

  /** S11: resolved-config provenance beside the results
    * (prediction_steps.py:460-461).
    */
  def writeProvenance(spark: SparkSession, outDir: String, configJson: String): Unit = {
    val p = new java.io.File(outDir)
    p.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/run_config.json"), configJson)
  }
}
