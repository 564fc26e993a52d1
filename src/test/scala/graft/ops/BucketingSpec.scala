package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed equi-join plans with zero exchanges (co-located)") {
    // per-JVM metastore but persistent warehouse dir: clear both first
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4)
    Bucketing.writeBucketed(b, "bkt_b", "k", 4)
    // the co-location claim is about the SHUFFLED join path (fact⋈fact,
    // neither side broadcastable at scale) — disable auto-broadcast so the
    // planner takes it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // one file per bucket (writeBucketed repartitions) + this conf → the
    // scan reports its sort order too, so the SMJ needs neither Exchange
    // nor Sort (the conf is off by default since 3.0 because multi-file
    // buckets interleave)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt_a", "bkt_b", "k")
      // collect() executes THIS dataset's QueryExecution (count() would
      // build a different one and leave this plan unexecuted)
      assert(joined.collect().length == 500)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.split("\n").count(l =>
        l.contains("Exchange") && !l.contains("Reused"))
      assert(exchanges == 0, s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      assert(!plan.linesIterator.exists(_.trim.matches("[:+]- Sort \\[.*")),
        s"single-file buckets + outputOrdering must not re-sort:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("SQL surface: GraftExtensions registers graft_polyhash / graft_seq_dot") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force init of the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate() // reuses the SparkContext, new session state
      val h = s2.sql("SELECT graft_polyhash('spark') AS h").collect()(0).getLong(0)
      val ref = "spark".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
      assert(h == ref)
      val d = s2.sql(
        "SELECT graft_seq_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
        .collect()(0).getDouble(0)
      assert(d == 1.5 * 2.0 + 2.0 * 0.5)
      // fused minhash: same values as the array_min reference family
      val mh = s2.sql(
        "SELECT graft_minhash(array(CAST(5 AS BIGINT), CAST(42 AS BIGINT)), 4) AS m")
        .collect()(0).getSeq[Long](0)
      val ps = graft.functions.StableHash.affineParams(4)
      val want = ps.map { case (a, b) =>
        Seq(5L, 42L).map(h => (h * a + b) % graft.functions.StableHash.P).min }
      assert(mh == want)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
