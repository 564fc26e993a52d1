package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** D-block skew handling, the AQE half (the salting half is SaltedAgg /
  * ao2): a hot key that would pin one reducer is split at runtime by
  * AQE's skew-join rule. The spec pins the `skew=true` plan annotation —
  * evidence the engine's joins self-heal under skew at scale rather than
  * relying on the author noticing every hot key.
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // shrink the thresholds so the test corpus's hot key counts as skewed
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // 50k rows, 90% on key 0, with a payload wide enough to trip the
      // byte threshold; the right side is uniform
      val big = spark.range(50000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        concat(lit("x" * 64), col("id")).as("payload"))
      val small = spark.range(200).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val j = big.join(small, "k")
      // collect() executes THIS dataset's QueryExecution (count() would
      // build a different one and leave this plan unexecuted/non-final)
      val n = j.collect().length
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("SaltedJoin.inner equals the plain join and spreads the hot key") {
    // 90% of the big side on one key
    val big = spark.range(20000).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
      col("id").as("row_id"))
    val small = spark.range(100).select(col("id").as("k"), (col("id") * 3).as("v"))
    val plain = big.join(small, Seq("k"))
      .select("k", "row_id", "v").as[(Long, Long, Long)].collect().toSet
    val salted = SaltedJoin.inner(big, small, Seq("k"), salts = 4)
      .select("k", "row_id", "v").as[(Long, Long, Long)].collect().toSet
    assert(salted === plain)
    // the salted small side carries every salt value for the hot key: the
    // hot key's rows really can land on `salts` distinct reducers
    val saltSpread = small.withColumn("__salt",
        explode(sequence(lit(0), lit(3))))
      .filter(col("k") === 0).select("__salt").distinct().count()
    assert(saltSpread === 4)
  }
}
