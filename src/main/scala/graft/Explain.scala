package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: `runMain graft.Explain <sfDir> <query...>` prints
  * each query's executed physical plan. The iteration loop behind PLANS.md —
  * every operator is tuned against this output (exchange count, join
  * strategy, pushed filters) before its plan shape is pinned in PlanSpec.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // --run: execute first so AQE finalizes (ReusedExchange/skew decisions
    // only appear in the final adaptive plan, never the initial one)
    val run = args.contains("--run")
    val rest = args.filterNot(_ == "--run")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      println(s"\n========== $q ==========")
      val df = SparkEntry.queries(q)(spark, sfDir)
      // collect(), not a noop write: the write wraps the plan in a NEW
      // QueryExecution, leaving df's own plan unexecuted (isFinalPlan=false)
      if (run) df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
