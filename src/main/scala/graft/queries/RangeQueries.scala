package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Num, RangeJoin}

/** Range joins (non-equi predicates) as binned equi-joins — see
  * [[graft.ops.RangeJoin]] for the scale rationale. Both gate queries
  * derive their interval tables from `nation` so the DuckDB oracle can
  * rebuild them verbatim; aggregation after the join keeps outputs small
  * and sums are decimal-exact ([[Num]]).
  */
object RangeQueries extends QueryPack {

  private val daySecs = 86400L
  // epoch seconds of 1995-01-01T00:00:00Z (session timezone is UTC)
  private val epoch1995 = 788918400L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Point-in-interval: events.value probed against 25 overlapping value
    // bands. The naive plan is a BroadcastNestedLoopJoin; the binned plan
    // is a shuffled equi-join on the bin id.
    "rj1_point_in_interval" -> ((s, d) => {
      val bands = Tables.nation(s, d).select(
        col("n_nationkey").as("iv_id"),
        (col("n_nationkey").cast("double") * 18.0).as("lo"),
        (col("n_nationkey").cast("double") * 18.0 + 40.0).as("hi"))
      val ev = Tables.events(s, d).select(col("event_id"), col("value"))
      RangeJoin.pointInInterval(ev, col("value"), bands, col("lo"), col("hi"),
          binWidth = 20.0)
        .groupBy("iv_id")
        .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("sum_value"))
        .orderBy("iv_id")
    }),

    // Interval-overlap: order activity windows [o_orderdate, +3 days]
    // against 25 maintenance windows spaced 96 days apart, 30 days wide.
    // Timestamps become epoch seconds for binning; the overlap predicate
    // is evaluated on the same values the oracle compares as timestamps.
    "rj2_interval_overlap" -> ((s, d) => {
      val wins = Tables.nation(s, d).select(
        col("n_nationkey").as("w_id"),
        (lit(epoch1995) + col("n_nationkey") * 96L * daySecs).as("ws"),
        (lit(epoch1995) + col("n_nationkey") * 96L * daySecs + 30L * daySecs).as("we"))
      val ords = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_totalprice"),
        // NTZ → timestamp (session tz pinned UTC) → epoch seconds; a direct
        // NTZ→long cast is rejected by Catalyst
        col("o_orderdate").cast("timestamp").cast("long").as("os"))
        .withColumn("oe", col("os") + 3L * daySecs)
      RangeJoin.intervalOverlap(ords, col("os"), col("oe"),
          wins, col("ws"), col("we"), binWidth = 32.0 * daySecs)
        .groupBy("w_id")
        .agg(count(lit(1)).as("n_orders"),
          Num.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("w_id")
    }),

    // Interval UNION length per user — the "merge overlapping intervals"
    // classic (total engaged time, union of per-event activity spans):
    // each event opens a 5-minute interval [t, t+300s); overlaps count
    // ONCE. Sweep-line as windows: an interval starts a new island when
    // its start exceeds the running max end of everything before it
    // (e9's island discipline generalized from gap-sessions to
    // fixed-length interval merging); covered time sums per island as
    // max(end) − min(start). All integer micros — no float anywhere.
    // Scale: both windows and both aggregates ride ONE user partitioning;
    // per-user state is the sort, never a cross-user structure.
    "rj3_interval_union" -> ((s, d) => {
      val lenUs = 300L * 1000000L
      val byUser = Window.partitionBy("user_id").orderBy("t", "event_id")
      val iv = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("t"))
        .withColumn("e", col("t") + lenUs)
        .withColumn("prev_max_e",
          max(col("e")).over(byUser.rowsBetween(
            Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when(col("prev_max_e").isNull, 1)
            .when(col("t") > col("prev_max_e"), 1).otherwise(0))
        .withColumn("island", sum(col("new_island")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      iv.groupBy("user_id", "island")
        .agg(min(col("t")).as("is_start"), max(col("e")).as("is_end"),
          count(lit(1)).as("n_iv"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("n_iv")).as("n_intervals"),
          sum(col("is_end") - col("is_start")).as("covered_us"))
        .orderBy("user_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "rj3_interval_union" ->
      """WITH iv AS (
           SELECT user_id, event_id, epoch_us(ts) AS t,
                  epoch_us(ts) + 300000000 AS e
           FROM events),
         marked AS (
           SELECT user_id, t, e,
                  CASE WHEN max(e) OVER (PARTITION BY user_id
                         ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL THEN 1
                       WHEN t > max(e) OVER (PARTITION BY user_id
                         ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       THEN 1 ELSE 0 END AS new_island,
                  event_id
           FROM iv),
         isl AS (
           SELECT user_id, t, e,
                  CAST(sum(new_island) OVER (PARTITION BY user_id
                    ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS island
           FROM marked),
         per_isl AS (
           SELECT user_id, island, min(t) AS is_start, max(e) AS is_end,
                  CAST(count(*) AS BIGINT) AS n_iv
           FROM isl GROUP BY 1, 2)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
                CAST(sum(n_iv) AS BIGINT) AS n_intervals,
                CAST(sum(is_end - is_start) AS BIGINT) AS covered_us
         FROM per_isl GROUP BY user_id ORDER BY user_id""",
    "rj1_point_in_interval" ->
      s"""WITH iv AS (SELECT n_nationkey AS iv_id,
                             n_nationkey * 18.0 AS lo,
                             n_nationkey * 18.0 + 40.0 AS hi
                      FROM nation)
          SELECT iv_id, count(*) AS n_events,
                 ${Num.sqlSum("value")} AS sum_value
          FROM iv JOIN events e ON e.value >= iv.lo AND e.value < iv.hi
          GROUP BY iv_id ORDER BY iv_id""",
    "rj2_interval_overlap" ->
      s"""WITH w AS (SELECT n_nationkey AS w_id,
                            TIMESTAMP '1995-01-01'
                              + n_nationkey * (INTERVAL 96 DAY) AS ws,
                            TIMESTAMP '1995-01-01'
                              + n_nationkey * (INTERVAL 96 DAY)
                              + INTERVAL 30 DAY AS we
                     FROM nation)
          SELECT w_id, count(*) AS n_orders,
                 ${Num.sqlSum("o_totalprice")} AS sum_price
          FROM w JOIN orders o
            ON o.o_orderdate <= w.we
           AND w.ws <= o.o_orderdate + INTERVAL 3 DAY
          GROUP BY w_id ORDER BY w_id""",
  )
}
