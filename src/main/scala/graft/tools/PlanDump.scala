package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump `explain("formatted")` for the named registry queries (args =
  * query keys, then an sfDir as the last arg) — the evidence PLANS.md
  * quotes. Plans are printed AFTER an execution so AQE's final plan is
  * what lands in the doc.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <query>... <sfDir>")
    val sfDir = args.last
    val names = args.dropRight(1)
    val spark = graft.Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // finalize AQE
      println(s"\n===== PLAN $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
