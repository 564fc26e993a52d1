package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Subset mirror of [[graft.Verify]] for the inner loop: dump ONLY the
  * named queries (plus an oracle_sql.json restricted to them) so
  * `tools/compare.py` can gate a query under development in seconds
  * instead of re-running the full 200-entry registry.
  *
  * Usage: VerifyOnly <sfDir> <outDir> <query> [query ...]
  */
object VerifyOnly {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOnly <sfDir> <outDir> <query> [query ...]")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not in the registry: ${unknown.mkString(", ")}")
    val spark = Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names)
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // queries without an oracle entry are simply absent (rows-only tier);
    // compare.py iterates oracle_sql.json, so absence = skipped, not fail
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
