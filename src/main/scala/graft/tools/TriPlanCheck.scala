package graft.tools

/** Print the enumerate/adjacency physical plans over the (r11)
  * pre-partitioned tri_base — evidence for the exchange-elimination
  * claims in PLANS.md. Usage: TriPlanCheck <sfDir>.
  */
object TriPlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tb = graft.queries.GraphQueries.triBase(spark, sfDir)
    tb.oriented.count(); tb.adj.count() // force the checkpoints

    println("\n===== adjacency build plan (expect: no Exchange) =====")
    println(graft.ops.Triangles.adjacency(tb.oriented)
      .queryExecution.executedPlan.toString)

    val enum0 = graft.ops.Triangles.enumerate(tb.oriented, tb.adj)
    enum0.write.format("noop").mode("overwrite").save()
    println("\n===== enumerate plan (expect: exchanges only on dst) =====")
    println(enum0.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
