package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan evidence for the native AsOfJoinExec (PLANS.md): the ao4 corpus
  * query's executed plan next to ao1's composed union+window form.
  */
object AsOfPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("ao4_asof_native", "ao1_asof_join")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"\n===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
