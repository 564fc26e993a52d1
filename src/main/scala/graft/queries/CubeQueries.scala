package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Num

/** Multi-dimensional aggregation surface (beyond the reference — SURVEY
  * §2.5 notes catlas has no grouping sets/cube/rollup/pivot; a complete
  * analytics engine needs them): ROLLUP/CUBE with grouping indicators,
  * pivot, and exact interpolated percentiles, all oracle-checked.
  */
object CubeQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(Num.dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "c2_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_s"),
          grouping(col("o_orderpriority")).cast("int").as("g_p"))
        .orderBy(col("g_s"), col("g_p"),
          col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    "c3_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")),

    "c4_percentile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          Num.davg(col("l_quantity")).as("mean_qty"))
        .orderBy("l_returnflag")),

    // Fixed-width histogram: one narrow bucket expression + one groupBy on
    // a 20-value key — the distribution-profiling scan that at 100 TB is a
    // single map-side-combined aggregation (20 groups survive the shuffle).
    "c5_histogram" -> ((s, d) =>
      Tables.events(s, d)
        .select(least(greatest(floor(col("value") / 25.0), lit(0L)), lit(19L))
          .cast("int").as("bucket"), col("value"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_v"))
        .orderBy("bucket")),

    // Set operations (SQL-surface completeness): INTERSECT/EXCEPT plan as
    // distinct + semi/anti join — keyed shuffles, never nested loops.
    "c6_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // customers with no completed ('F') order — EXCEPT as distinct + anti
    // join. (Plain customers-minus-all-orderers is empty in this corpus —
    // a 0-row ∩ 0-row hash match proves nothing, so the filtered form.)
    "c7_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("o_custkey"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")))
        .orderBy("o_custkey")),

    // GROUPING SETS — the general form c1/c2 specialize: an explicit,
    // non-hierarchical set list (here: both dims, each alone, grand
    // total). Spark's DataFrame API exposes only rollup/cube, so this
    // goes through the SQL surface; the plan is the same single Expand +
    // one aggregate exchange as c1/c2 (each input row replicated once per
    // set, partial agg before the shuffle). The aggregate SQL text is
    // Num.sqlSum verbatim on BOTH engines — one string, two engines,
    // decimal-exact either way.
    "c9_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gsv")
      s.sql(
        s"""SELECT l_returnflag, l_linestatus,
               ${Num.sqlSum("l_quantity")} AS sum_qty, count(*) AS n,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status
           FROM lineitem_gsv
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                   (l_returnflag), (l_linestatus), ())
           ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
                    l_linestatus NULLS FIRST""")
    }),

    // EXCEPT ALL — multiset difference (c7 is the distinct form): each
    // row's multiplicity survives subtraction. Plans as one keyed shuffle
    // with a per-key count diff (no distinct collapse); the output groups
    // by key so surviving multiplicities are visible to the oracle.
    "c10_except_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_suppkey").as("k"))
        .exceptAll(li.filter(col("l_returnflag") === "R")
          .select(col("l_suppkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    // listagg/string_agg: made order-independent (and thus cross-engine
    // exact) by sorting the distinct set BEFORE joining — a raw string_agg
    // over an unordered group is nondeterministic on any parallel engine.
    // A/B experiment readout in ONE aggregate pass: deterministic hash
    // split (portable polyHash → both engines assign identical variants),
    // per-variant n/Σx/Σx² as conditional decimal-exact sums, then mean,
    // sample variance, and the Welch t statistic as a fixed double tree
    // over the exact sums. No join, no second scan — the 100 TB shape is
    // a single partial+final HashAggregate. sqrt/÷/× are IEEE
    // correctly-rounded (identical cross-engine); only ln needs the
    // decimal pin elsewhere (t20), not used here.
    "ab1_welch_ttest" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("value"),
          pmod(graft.functions.StableHash.polyHash(
            concat_ws("", lit("ab|"), col("user_id").cast("string"))), lit(2))
            .as("variant"))
      val sums = ev.agg(
        sum(when(col("variant") === 0, 1)).cast("long").as("n_a"),
        sum(when(col("variant") === 1, 1)).cast("long").as("n_b"),
        Num.dsum(when(col("variant") === 0, col("value"))).as("s1_a"),
        Num.dsum(when(col("variant") === 1, col("value"))).as("s1_b"),
        Num.dsum(when(col("variant") === 0, col("value") * col("value"))).as("s2_a"),
        Num.dsum(when(col("variant") === 1, col("value") * col("value"))).as("s2_b"))
      val stats = sums.select(col("n_a"), col("n_b"),
        (col("s1_a") / col("n_a").cast("double")).as("mean_a"),
        (col("s1_b") / col("n_b").cast("double")).as("mean_b"),
        ((col("s2_a") - col("s1_a") * col("s1_a") / col("n_a").cast("double"))
          / (col("n_a") - 1).cast("double")).as("var_a"),
        ((col("s2_b") - col("s1_b") * col("s1_b") / col("n_b").cast("double"))
          / (col("n_b") - 1).cast("double")).as("var_b"))
      stats.select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("var_a"), col("var_b"),
        ((col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("n_a").cast("double") +
            col("var_b") / col("n_b").cast("double"))).as("t_stat"))
    }),

    "c8_string_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),
  )

  val oracles: Map[String, String] = Map(
    "c1_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
                 ${Num.sqlSum("l_quantity")} AS sum_qty, count(*) AS n,
                 CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
                 CAST(GROUPING(l_linestatus) AS INT) AS g_status
          FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
          ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
                   l_linestatus NULLS FIRST""",
    "c2_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
                CAST(GROUPING(o_orderpriority) AS INT) AS g_p
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "c3_pivot" ->
      """SELECT o_orderpriority,
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "c4_percentile" ->
      s"""SELECT l_returnflag,
                 quantile_cont(l_quantity, 0.5) AS p50,
                 quantile_cont(l_quantity, 0.9) AS p90,
                 ${Num.sqlAvg("l_quantity")} AS mean_qty
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "c5_histogram" ->
      s"""SELECT CAST(least(greatest(floor(value / 25.0), 0), 19) AS INT) AS bucket,
                 count(*) AS n, ${Num.sqlSum("value")} AS sum_v
          FROM events GROUP BY 1 ORDER BY bucket""",
    "c6_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey""",
    "c7_except" ->
      """SELECT c_custkey AS o_custkey FROM customer
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",
    "c9_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
                 ${Num.sqlSum("l_quantity")} AS sum_qty, count(*) AS n,
                 CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
                 CAST(GROUPING(l_linestatus) AS INT) AS g_status
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                  (l_returnflag), (l_linestatus), ())
          ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
                   l_linestatus NULLS FIRST""",
    "c10_except_all" ->
      """WITH x AS (
           SELECT l_suppkey AS k FROM lineitem
           EXCEPT ALL
           SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
         SELECT k, count(*) AS n FROM x GROUP BY k ORDER BY k""",
    "ab1_welch_ttest" -> {
      import graft.functions.StableHash
      s"""WITH ev AS (
           SELECT value,
                  ${StableHash.polyHashSql("concat('ab|', CAST(user_id AS VARCHAR))")} % 2
                    AS variant
           FROM events WHERE event_type = 'purchase'),
         sums AS (
           SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n_b,
                  ${Num.sqlSum("CASE WHEN variant = 0 THEN value END")} AS s1_a,
                  ${Num.sqlSum("CASE WHEN variant = 1 THEN value END")} AS s1_b,
                  ${Num.sqlSum("CASE WHEN variant = 0 THEN value * value END")} AS s2_a,
                  ${Num.sqlSum("CASE WHEN variant = 1 THEN value * value END")} AS s2_b
           FROM ev),
         stats AS (
           SELECT n_a, n_b,
                  s1_a / CAST(n_a AS DOUBLE) AS mean_a,
                  s1_b / CAST(n_b AS DOUBLE) AS mean_b,
                  (s2_a - s1_a * s1_a / CAST(n_a AS DOUBLE))
                    / CAST(n_a - 1 AS DOUBLE) AS var_a,
                  (s2_b - s1_b * s1_b / CAST(n_b AS DOUBLE))
                    / CAST(n_b - 1 AS DOUBLE) AS var_b
           FROM sums)
         SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
                (mean_a - mean_b) / sqrt(var_a / CAST(n_a AS DOUBLE)
                  + var_b / CAST(n_b AS DOUBLE)) AS t_stat
         FROM stats"""
    },

    "c8_string_agg" ->
      """SELECT o_orderpriority,
                array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
                  AS statuses,
                count(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
  )
}
