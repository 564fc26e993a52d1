package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-query wall-time under Bench's exact harness (local[32], noop sink),
  * repeated so cold (codegen/JIT) and warm costs separate: args = query
  * keys, then an sfDir as the last arg. Reps via SPARK_GRAFT_REPS (def 3).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQuery <query>... <sfDir>")
    val sfDir = args.last
    val names = args.dropRight(1)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = graft.Sessions.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
