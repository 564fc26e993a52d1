package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** D-block: bucketed co-located join — the pay-the-shuffle-once layout.
  * The assertions are on the PLAN, not just the rows: both scans must
  * satisfy the join's partitioning so no Exchange (and no Sort, thanks to
  * sortBy) appears between scan and SortMergeJoin.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed+sorted tables join with zero exchanges and zero sorts") {
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val or = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(or, "or_bucketed", "l_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // one file per bucket + this conf → the scan reports its sort order
    // (off by default since 3.0 because multi-file buckets interleave)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("or_bucketed"), "l_orderkey")
      val n = j.count()
      val plan = j.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // scans are bucket-sorted → the SMJ's sort requirement is satisfied
      // at read time (no Sort operator above either scan)
      assert(!plan.linesIterator.exists(_.trim.matches("[:+]- Sort \\[.*")),
        s"bucketed join must not re-sort:\n$plan")

      // same result as the shuffled join over the raw parquet
      val expected = li.join(or, "l_orderkey").count()
      assert(n == expected && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }
}
