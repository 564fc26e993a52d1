package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins RangeJoinBinningRule: a declarative range join under the rule
  * yields exactly the naive join's rows while planning as an equi-join
  * (no nested-loop / cartesian), in both point-side orientations; unset
  * conf leaves the naive plan untouched.
  */
class RangeJoinRuleSpec extends SparkTestBase {

  private def withRuleSession[A](f: SparkSession => A): A = {
    val _ = spark // force shared-session init so we reuse its SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      f(s2)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  private def points(s: SparkSession): DataFrame = {
    import s.implicits._
    // includes values below/above every interval and on bin boundaries
    (0 until 200).map(i => (i.toLong, i * 0.7 - 10.0)).toDF("pid", "p")
  }
  private def intervals(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, 0.0, 10.0), (2L, 9.9, 12.4), (3L, 50.0, 51.0),
      (4L, -5.0, -5.0),            // empty half-open interval
      (5L, 30.0, 20.0),            // reversed: must match nothing
      (6L, 119.0, 140.0))          // extends past all points
      .toDF("iid", "lo", "hi")
  }

  private def canon(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("binned rewrite: same rows as naive, equi-join plan, both orientations") {
    withRuleSession { s =>
      val p = points(s); val iv = intervals(s)
      val cond = col("p") >= col("lo") && col("p") < col("hi")

      s.conf.unset(RangeJoinBinningRule.ConfKey)
      val naive = canon(p.join(iv, cond))
      assert(naive.nonEmpty && !naive.exists(_._2 == 5L))

      s.conf.set(RangeJoinBinningRule.ConfKey, "5.0")
      for (joined <- Seq(p.join(iv, cond), iv.join(p, cond))) {
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          s"range join not rewritten:\n$plan")
        assert(canon(joined) == naive)
      }
      s.conf.unset(RangeJoinBinningRule.ConfKey)
    }
  }

  test("BETWEEN spelling (two inclusive bounds, via spark.sql) also rewrites") {
    withRuleSession { s =>
      val p = points(s); val iv = intervals(s)
      val cond = col("p") >= col("lo") && col("p") <= col("hi")
      s.conf.unset(RangeJoinBinningRule.ConfKey)
      val naive = canon(p.join(iv, cond))
      s.conf.set(RangeJoinBinningRule.ConfKey, "5.0")
      try {
        p.createOrReplaceTempView("pts"); iv.createOrReplaceTempView("ivs")
        val sqlJoined = s.sql(
          "SELECT pid, iid FROM pts JOIN ivs ON p BETWEEN lo AND hi")
        val plan = sqlJoined.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          s"BETWEEN join not rewritten:\n$plan")
        assert(canon(sqlJoined) == naive)
      } finally s.conf.unset(RangeJoinBinningRule.ConfKey)
    }
  }

  test("non-double bound columns do not fire the rule") {
    withRuleSession { s =>
      import s.implicits._
      s.conf.set(RangeJoinBinningRule.ConfKey, "5.0")
      try {
        val a = Seq((1L, 2L), (2L, 7L)).toDF("k", "v") // LONG, not DOUBLE
        val b = Seq((10L, 0L, 5L), (20L, 5L, 10L)).toDF("iid", "lo", "hi")
        val joined = a.join(b, col("v") >= col("lo") && col("v") < col("hi"))
        assert(joined.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
          == Seq((1L, 10L), (2L, 20L)))
        val plan = joined.queryExecution.optimizedPlan.toString
        assert(!plan.contains("__graft_pbin"), s"should not rewrite:\n$plan")
      } finally s.conf.unset(RangeJoinBinningRule.ConfKey)
    }
  }

  test("filter-above-cross-join spelling (FROM a, b WHERE ...) also rewrites") {
    withRuleSession { s =>
      val p = points(s); val iv = intervals(s)
      val cond = col("p") >= col("lo") && col("p") < col("hi")
      s.conf.unset(RangeJoinBinningRule.ConfKey)
      val naive = canon(p.join(iv, cond))
      s.conf.set(RangeJoinBinningRule.ConfKey, "5.0")
      try {
        // PushPredicateThroughJoin (same fixpoint batch) folds the WHERE
        // into the join condition; the rule must fire on that later pass
        p.createOrReplaceTempView("pts2"); iv.createOrReplaceTempView("ivs2")
        val implicitJoin = s.sql(
          "SELECT pid, iid FROM pts2, ivs2 WHERE p >= lo AND p < hi")
        val plan = implicitJoin.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          s"WHERE-form range join not rewritten:\n$plan")
        assert(canon(implicitJoin) == naive)
      } finally s.conf.unset(RangeJoinBinningRule.ConfKey)
    }
  }

  test("two large sides: rewritten join shuffles on the bin key (no broadcast)") {
    withRuleSession { s =>
      val p = points(s); val iv = intervals(s)
      val cond = col("p") >= col("lo") && col("p") < col("hi")
      s.conf.unset(RangeJoinBinningRule.ConfKey)
      val naive = canon(p.join(iv, cond))
      s.conf.set(RangeJoinBinningRule.ConfKey, "5.0")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = p.join(iv, cond)
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          s"not rewritten:\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"expected a shuffled equi-join on the bin key:\n$plan")
        assert(canon(joined) == naive)
      } finally {
        s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        s.conf.unset(RangeJoinBinningRule.ConfKey)
      }
    }
  }

  test("interval-overlap joins rewrite, preserving reversed-interval matches") {
    withRuleSession { s =>
      import s.implicits._
      // includes a REVERSED left interval [10, 2]: the raw predicate
      // lLo <= rHi AND rLo <= lHi still matches it against [1, 20] —
      // the transparent rewrite must keep that row (the explicit
      // RangeJoin API filters reversed intervals; a rule may not)
      val a = Seq((1L, 0.0, 3.0), (2L, 2.5, 7.0), (3L, 10.0, 2.0),
        (4L, 40.0, 45.0)).toDF("aid", "alo", "ahi")
      val b = Seq((10L, 1.0, 20.0), (20L, 2.9, 3.1), (30L, 44.0, 44.5),
        (40L, 100.0, 90.0)).toDF("bid", "blo", "bhi")
      val cond = col("alo") <= col("bhi") && col("blo") <= col("ahi")
      def canon2(df: org.apache.spark.sql.DataFrame) =
        df.select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
      s.conf.unset(RangeJoinBinningRule.ConfKey)
      val naive = canon2(a.join(b, cond))
      assert(naive.contains((3L, 10L)), s"premise: reversed matches, got $naive")
      s.conf.set(RangeJoinBinningRule.ConfKey, "5.0")
      try {
        val joined = a.join(b, cond)
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          s"overlap join not rewritten:\n$plan")
        assert(canon2(joined) == naive, s"got ${canon2(joined)}\nwant $naive")
      } finally s.conf.unset(RangeJoinBinningRule.ConfKey)
    }
  }

  test("rule leaves joins with equi keys or extra predicates alone") {
    withRuleSession { s =>
      import s.implicits._
      s.conf.set(RangeJoinBinningRule.ConfKey, "5.0")
      try {
        val a = Seq((1L, 2.0), (2L, 7.0)).toDF("k", "v")
        val b = Seq((1L, 0.0, 5.0), (2L, 5.0, 10.0)).toDF("k2", "lo", "hi")
        // equi key present: Spark's own equi-join machinery must keep it
        val mixed = a.join(b, col("k") === col("k2") &&
          col("v") >= col("lo") && col("v") < col("hi"))
        assert(mixed.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
        val plan = mixed.queryExecution.optimizedPlan.toString
        assert(!plan.contains("__graft_pbin"), s"should not rewrite:\n$plan")
      } finally s.conf.unset(RangeJoinBinningRule.ConfKey)
    }
  }
}
