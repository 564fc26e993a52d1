package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Ordered-window analytics (running totals, lag deltas, ranked slices) —
  * the per-group sequential reads a trajectory/ledger consumer does. All
  * windows are `partitionBy(key).orderBy(unique keys)`: one shuffle on the
  * key, sequential scan within each partition, no global sort. Running
  * sums accumulate in DECIMAL so the fold is exact and order-stable
  * ([[graft.ops.Num]] discipline applied to window frames).
  */
object WindowQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Running per-customer spend: the cumulative-ledger shape.
    "w1_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("seq"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_spend"))
        .orderBy("o_custkey", "seq")
    }),

    // Per-user deltas between consecutive events (lag): the derivative a
    // trajectory-anomaly screen reads. Ordering key (ts, event_id) is
    // unique, so the pairing — and the double subtraction — is exact.
    "w2_lag_delta" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .filter(col("delta").isNotNull)
        .orderBy("user_id", "event_id")
    }),

    // Top-3-by-rank within each priority, ties kept (rank, not row_number):
    // the deterministic ranked-slice read.
    "w3_ranked_slice" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    }),
    // The remaining rank-family and value-window functions in one slice:
    // percent_rank / cume_dist (exact rationals — integer ratios divide
    // identically under IEEE in any engine, given the UNIQUE ordering
    // key), plus first/nth/last over the FULL partition frame (explicit
    // rows-between: the default running frame would make nth/last
    // order-dependent prefixes). Same one-shuffle shape as w1–w3.
    "w4_window_stats" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          row_number().over(w).as("rn"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("l_quantity")).over(wf).as("fv"),
          nth_value(col("l_quantity"), 100).over(wf).as("nv"),
          last(col("l_quantity")).over(wf).as("lv"))
        .filter(col("rn") <= 15)
        .orderBy("l_returnflag", "rn")
    }),
    // Time-based rolling window (RANGE frame, not ROWS): per event, the
    // decimal-exact sum and count of the user's events in the trailing
    // hour — frame bounds follow the VALUE of the ordering column, so
    // same-µs ties land in the same frame regardless of physical order
    // (deterministic on any engine, no tie-break needed). Same single
    // user_id shuffle as every w-query.
    "w5_range_rolling" -> ((s, d) => {
      val hourUs = 3600L * 1000 * 1000
      val w = Window.partitionBy("user_id").orderBy(col("ets"))
        .rangeBetween(-hourUs, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"),
          col("value"))
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast("decimal(18,6)")).over(w)
            .cast("double").as("hour_sum"),
          count(lit(1)).over(w).as("n_in_hour"))
        .orderBy("user_id", "event_id")
    }),

    // Truncated EWMA (α = 0.5, adjust=False, last 30 events) over each
    // user's stream — the monitoring smoother. FP discipline: no pow()
    // (libm last-ulp differs across engines); the smoother is ONE left
    // fold acc·½ + x·½ over the frame-ordered window array, identical
    // arithmetic in any engine and under any partitioning. One user-keyed
    // exchange; per-row work bounded by the 30-row frame.
    "w6_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ets", "event_id")
        .rowsBetween(-29, Window.currentRow)
      Tables.events(s, d)
        // NULL discipline, pinned on BOTH engines: Spark's collect_list
        // silently DROPS nulls while DuckDB's list() keeps them, so a
        // null value would shift the fold cross-engine (and diverge from
        // StreamOps.ewma, whose Dataset[Evt] value is a primitive Double).
        // The explicit filter makes the non-null frame part of the
        // operator's contract rather than a fixture accident.
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"),
          col("value"))
        .withColumn("arr", collect_list(col("value")).over(w))
        .withColumn("ewma",
          aggregate(slice(col("arr"), 2, 29), element_at(col("arr"), 1),
            (acc, x) => acc * lit(0.5) + x * lit(0.5)))
        .select("user_id", "event_id", "value", "ewma")
        .orderBy("user_id", "event_id")
    }),
    // One-sided CUSUM drift detector per user stream: s_i = max(0,
    // s_{i-1} + (x_i - target)) over the time-ordered value sequence —
    // the classic change-point statistic (a persistent upward shift in a
    // metric accumulates; noise around the target resets to 0). Target
    // 50 sits at the corpus value mean, so the statistic genuinely
    // fluctuates instead of degenerating to 0 or to Σx − n·target.
    // Unlike the w6 frame smoother this is a PER-KEY fold, not per-row:
    // one user-keyed aggregate collects the (ts, id, value) sequence
    // (state bounded by per-user history, the same bound every
    // sessionization op already carries), sort_array pins the exact
    // event-time order, and ONE left fold — identical lambda both
    // engines, init 0.0 prepended on the DuckDB side since list_reduce
    // seeds from the head — produces the final statistic. No window, no
    // per-row arrays, one exchange.
    "w7_cusum" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("value").isNotNull) // w6 NULL discipline
        .select(col("user_id"), expr("ts DIV 1000").as("ets"),
          col("event_id"), col("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sort_array(collect_list(
            struct(col("ets"), col("event_id"), col("value")))).as("seq"))
        .withColumn("cusum",
          aggregate(col("seq"), lit(0.0),
            (acc, x) => greatest(acc + x.getField("value") - lit(50.0),
              lit(0.0))))
        .select(col("user_id"), col("n_events"),
          col("cusum").cast("decimal(18,6)").cast("double").as("cusum"))
        .orderBy("user_id")),

    // Trailing-7-day Pearson correlation between the click and purchase
    // daily revenue series — the metric-coupling drift readout (two KPIs
    // that normally move together decoupling is an incident signal). The
    // unpartitionable global-order window is made scalable the st3/e14
    // way: ONE data-scale keyed aggregate reduces events to the per-DAY
    // series first, so the ordered window runs over a table bounded by
    // the time domain, never by data. Exactness: cents are integers, all
    // window sums (Σx, Σx², Σxy…) are integer and order-independent; the
    // correlation is one fixed double tree over them (sqrt is correctly
    // rounded — ab1's rule). The variance-product factors are cast to
    // double BEFORE multiplying: their bigint product could overflow,
    // their doubles cannot. Full-window gate (nw = 7), e15's discipline.
    "w8_rolling_corr" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val daily = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase") &&
          col("value").isNotNull)
        .select(expr(s"ts DIV $dayNs").as("day"), col("event_type").as("t"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy("day")
        .agg(sum(when(col("t") === "click", col("cents")).otherwise(0L)).as("x"),
          sum(when(col("t") === "purchase", col("cents")).otherwise(0L)).as("y"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .select(col("day"), col("x"), col("y"),
          count(lit(1)).over(w).as("nw"),
          sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
          sum(col("x") * col("x")).over(w).as("sxx"),
          sum(col("y") * col("y")).over(w).as("syy"),
          sum(col("x") * col("y")).over(w).as("sxy"))
        .filter(col("nw") === 7)
        .select(col("day"), col("x"), col("y"),
          ((col("nw") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("nw") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("nw") * col("syy") - col("sy") * col("sy")).cast("double")))
            .as("corr7"))
        .orderBy("day")
    }),

    // Holt linear (double-exponential) smoothing per event type — w6's
    // EWMA with a TREND state, the level+slope forecaster a capacity
    // planner runs on daily volume. α = β = 0.5 (exact binary doubles).
    // Fold discipline: the per-type daily series is calendar-bounded
    // (ONE data-scale keyed aggregate reduces events to it — the w8
    // rule); the (level, trend) recursion is ONE left fold over the
    // day-ordered series. The two-value state rides a 2-element DOUBLE
    // ARRAY, not a struct: this DuckDB's list_reduce over STRUCT
    // accumulators is broken (measured: reduce over [s1,s2,s3] ≠
    // reduce(reduce([s1,s2]), s3) — fold composition violated — while
    // the list encoding composes exactly), and list_reduce seeds from
    // the head — which IS the Holt init ([l₀ = x₀, b₀ = 0]); Spark folds
    // the identical shape explicitly. Every step is the same IEEE tree
    // both engines; outputs decimal-pinned once.
    "w10_holt_linear" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull) // w6 NULL discipline
        .select(col("event_type"), expr(s"ts DIV $dayNs").as("day"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy("event_type", "day").agg(sum(col("cents")).as("v"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sort_array(collect_list(struct(col("day"), col("v")))).as("seq"))
        .withColumn("vals", expr("transform(seq, x -> " +
          "array(CAST(x.v AS DOUBLE), CAST(0.0 AS DOUBLE)))"))
        .withColumn("st", aggregate(
          expr("slice(vals, 2, greatest(size(vals) - 1, 0))"),
          element_at(col("vals"), 1),
          (acc, x) => {
            val l0 = element_at(acc, 1); val b0 = element_at(acc, 2)
            val nl = element_at(x, 1) * lit(0.5) + (l0 + b0) * lit(0.5)
            array(nl, (nl - l0) * lit(0.5) + b0 * lit(0.5))
          }))
        .select(col("event_type"), col("n_days"),
          element_at(col("st"), 1).cast("decimal(18,6)").cast("double")
            .as("level"),
          element_at(col("st"), 2).cast("decimal(18,6)").cast("double")
            .as("trend"),
          (element_at(col("st"), 1) + lit(7.0) * element_at(col("st"), 2))
            .cast("decimal(18,6)").cast("double").as("forecast_7d"))
        .orderBy("event_type")
    }),

    // Rolling-origin backtest of the w10 Holt forecaster — the evaluation
    // harness a forecasting deployment runs before trusting forecast_7d:
    // for every cutoff k in [8, n), fit on the first k observed days
    // (the SAME fold expression as w10 — one definition would drift is
    // the risk; the constants and lambda are copied verbatim and the
    // oracle mirrors w10's list_reduce form) and score the one-step-ahead
    // prediction level+trend against day k+1's actual. MAE/bias per type
    // from decimal-pinned per-fold errors (w7's rule — the fold output is
    // a full-width double). Scale shape: the series is CALENDAR-bounded
    // (w8's rule), so the k-fold fan-out is O(days²) per type — bounded
    // by the time domain, never by corpus size; one keyed aggregate
    // builds each series, one narrow explode scores all cutoffs.
    "w14_holt_backtest" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val minTrain = 8
      val daily = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"), expr(s"ts DIV $dayNs").as("day"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy("event_type", "day").agg(sum(col("cents")).as("v"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sort_array(collect_list(struct(col("day"), col("v")))).as("seq"))
        .withColumn("vals", expr("transform(seq, x -> " +
          "array(CAST(x.v AS DOUBLE), CAST(0.0 AS DOUBLE)))"))
        .filter(col("n_days") > minTrain) // sequence() descends if k>stop
        .select(col("event_type"), col("n_days"), col("vals"),
          explode(sequence(lit(minTrain.toLong), col("n_days") - 1))
            .as("k"))
        .withColumn("st", aggregate(
          expr("slice(vals, 2, CAST(k - 1 AS INT))"),
          element_at(col("vals"), 1),
          (acc, x) => {
            val l0 = element_at(acc, 1); val b0 = element_at(acc, 2)
            val nl = element_at(x, 1) * lit(0.5) + (l0 + b0) * lit(0.5)
            array(nl, (nl - l0) * lit(0.5) + b0 * lit(0.5))
          }))
        .withColumn("pred",
          element_at(col("st"), 1) + element_at(col("st"), 2))
        .withColumn("err",
          (col("pred") -
            element_at(element_at(col("vals"), (col("k") + 1).cast("int")), 1))
            .cast("decimal(18,6)"))
        .groupBy("event_type", "n_days")
        .agg(count(lit(1)).as("n_folds"),
          (sum(abs(col("err"))).cast("double") / count(lit(1)))
            .as("mae_cents"),
          (sum(col("err")).cast("double") / count(lit(1)))
            .as("bias_cents"))
        .orderBy("event_type")
    }),

    // Theil–Sen robust trend: median of all pairwise slopes of the daily
    // event-count series — the outlier-proof alternative to a5's OLS
    // slope (one corrupt day moves OLS arbitrarily; it moves the slope
    // median not at all until half the days are corrupt). Scale shape:
    // the quadratic pair term runs over the CALENDAR-bounded daily table
    // (w8's rule — one data-scale keyed aggregate first), so pair count
    // grows with the time domain, never with data. Exactness: each slope
    // is ONE double division of two exact longs (identical bit pattern
    // both engines), slopes group/order by exact double equality, and
    // the median is st8's integer smallest-value rule (first slope whose
    // 2·cum-weight reaches the total) — no float thresholds, no averaging
    // of middle elements.
    "w11_theil_sen" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts DIV $dayNs").as("day"))
        .agg(count(lit(1)).as("c"))
      val a = daily.select(col("day").as("d1"), col("c").as("c1"))
      val b = daily.select(col("day").as("d2"), col("c").as("c2"))
      // calendar-bounded day-pair self-join (sf10 probe: 0.74× per 10×
      // data) — broadcast the build side per the cross-join lint rule
      val slopes = a.join(broadcast(b), col("d1") < col("d2"))
        .select(((col("c2") - col("c1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("slope"))
        .groupBy("slope").agg(count(lit(1)).as("w"))
      val ord = Window.orderBy("slope")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      slopes
        .withColumn("cumw", sum(col("w")).over(ord))
        .withColumn("totw", sum(col("w")).over(Window.partitionBy()))
        .filter(col("cumw") * 2 >= col("totw"))
        .agg(max(col("totw")).as("n_pairs"), min(col("slope")).as("slope_med"))
        .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
        .select("n_days", "n_pairs", "slope_med")
    }),

    // Seasonal STRENGTH per event type — the one-number readout that
    // closes the time-series family (e18 detects the weekly period, e16
    // corrects for it, w10 forecasts, w11 fits the robust trend; this
    // quantifies how much of the detrended variance the day-of-week
    // pattern explains): F = max(0, 1 − SS_resid/SS_detrended), the
    // Hyndman seasonal-strength form on an STL-lite decomposition.
    // Exactness: the centered 7-day moving average is removed as the
    // INTEGER X = 7·v − Σ₇v (never a rational trend column), so all
    // moments are integer/decimal aggregates; the dow sum-of-squares
    // terms Sw²/nw are 7 fixed double trees folded in sorted dow order
    // (w10's list discipline — never an unordered double sum); the
    // final ratio is one guarded tree, decimal-pinned. Full-window gate
    // (nw = 7) per e15.
    "w12_seasonal_strength" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr(s"ts DIV $dayNs").as("day"))
        .agg(count(lit(1)).as("v"))
      val w7 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-3, 3)
      val det = daily
        .withColumn("nw", count(lit(1)).over(w7))
        .withColumn("s7", sum(col("v")).over(w7))
        .filter(col("nw") === 7)
        .select(col("event_type"), (col("day") % 7).as("dow"),
          (col("v") * 7 - col("s7")).as("x"))
      val tot = det.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("q"))
      val seas = det.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("nw"), sum(col("x")).as("sw"))
        .select(col("event_type"), col("dow"),
          (col("sw").cast("double") * col("sw").cast("double") /
            col("nw").cast("double")).as("term"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("dow"), col("term"))))
          .as("ts"))
        .select(col("event_type"),
          aggregate(col("ts"), lit(0.0),
            (acc, t) => acc + t.getField("term")).as("sst"))
      tot.join(seas, Seq("event_type"))
        .select(col("event_type"), col("n"),
          when(col("q").cast("double") -
              col("sx").cast("double") * col("sx").cast("double") /
                col("n").cast("double") > 0.0,
            greatest(lit(0.0), lit(1.0) -
              (col("q").cast("double") - col("sst")) /
                (col("q").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double") /
                    col("n").cast("double"))))
            .cast("decimal(18,6)").cast("double").as("seasonal_strength"))
        .orderBy("event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "w1_running_sum" ->
      """SELECT o_custkey, o_orderkey,
                CAST(row_number() OVER w AS INT) AS seq,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                  AS running_spend
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, seq""",
    "w2_lag_delta" ->
      """SELECT user_id, event_id, delta FROM (
           SELECT user_id, event_id,
                  value - lag(value, 1) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS delta
           FROM events)
         WHERE delta IS NOT NULL
         ORDER BY user_id, event_id""",
    "w3_ranked_slice" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  CAST(rank() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey)
                       AS INT) AS rnk
           FROM orders)
         WHERE rnk <= 3
         ORDER BY o_orderpriority, rnk, o_orderkey""",
    "w4_window_stats" ->
      """SELECT l_returnflag, l_quantity, rn, pr, cd, fv, nv, lv FROM (
           SELECT l_returnflag, l_quantity,
                  CAST(row_number() OVER w AS INT) AS rn,
                  percent_rank() OVER w AS pr,
                  cume_dist() OVER w AS cd,
                  first_value(l_quantity) OVER wf AS fv,
                  nth_value(l_quantity, 100) OVER wf AS nv,
                  last_value(l_quantity) OVER wf AS lv
           FROM lineitem
           WINDOW w AS (PARTITION BY l_returnflag
                        ORDER BY l_quantity, l_orderkey, l_linenumber),
                  wf AS (PARTITION BY l_returnflag
                         ORDER BY l_quantity, l_orderkey, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         WHERE rn <= 15
         ORDER BY l_returnflag, rn""",
    "w5_range_rolling" ->
      """SELECT user_id, event_id,
                CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                  AS hour_sum,
                count(*) OVER w AS n_in_hour
         FROM (SELECT user_id, event_id, epoch_us(ts) AS ets, value FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ets
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "w6_ewma" ->
      """SELECT user_id, event_id, value,
                list_reduce(l, (a, b) -> a * 0.5 + b * 0.5) AS ewma
         FROM (SELECT user_id, event_id, value,
                      list(value) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id
                        ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS l
               FROM events
               WHERE value IS NOT NULL)
         ORDER BY user_id, event_id""",
    // list_reduce seeds from the list head, so the 0.0 init is prepended;
    // the fold body is then applied once per value — the identical
    // sequence of IEEE ops as Spark's aggregate(seq, 0.0, f).
    "w7_cusum" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(CAST(list_reduce(
                       list_prepend(0.0, list(value ORDER BY epoch_us(ts), event_id)),
                       (a, b) -> greatest(a + b - 50.0, 0.0))
                     AS DECIMAL(18,6)) AS DOUBLE) AS cusum
         FROM events
         WHERE value IS NOT NULL
         GROUP BY user_id
         ORDER BY user_id""",
    // same integer window sums (DuckDB sum() → HUGEINT, CAST back at
    // every step — st3's rule), same double tree with the variance
    // factors cast before multiplying
    "w8_rolling_corr" ->
      """WITH daily AS (
           SELECT day,
                  CAST(sum(CASE WHEN t = 'click' THEN cents ELSE 0 END)
                       AS BIGINT) AS x,
                  CAST(sum(CASE WHEN t = 'purchase' THEN cents ELSE 0 END)
                       AS BIGINT) AS y
           FROM (SELECT epoch_us(ts) // 86400000000 AS day, event_type AS t,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND value IS NOT NULL)
           GROUP BY day),
         w AS (
           SELECT day, x, y,
                  CAST(count(*) OVER win AS BIGINT) AS nw,
                  CAST(sum(x) OVER win AS BIGINT) AS sx,
                  CAST(sum(y) OVER win AS BIGINT) AS sy,
                  CAST(sum(x * x) OVER win AS BIGINT) AS sxx,
                  CAST(sum(y * y) OVER win AS BIGINT) AS syy,
                  CAST(sum(x * y) OVER win AS BIGINT) AS sxy
           FROM daily
           WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
                          AND CURRENT ROW))
         SELECT day, x, y,
                CAST(nw * sxy - sx * sy AS DOUBLE) /
                  sqrt(CAST(nw * sxx - sx * sx AS DOUBLE) *
                       CAST(nw * syy - sy * sy AS DOUBLE)) AS corr7
         FROM w WHERE nw = 7 ORDER BY day""",

    // same-type fold with a LIST-encoded (level, trend) state — this
    // DuckDB's list_reduce over struct accumulators violates fold
    // composition (see the Spark-side comment); the 2-double list form
    // composes exactly. reduce seeds from the head = the Holt init.
    "w10_holt_linear" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL
           GROUP BY 1, 2),
         seqs AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  list_transform(list({'day': day, 'v': v} ORDER BY day),
                    x -> [CAST(x.v AS DOUBLE), CAST(0.0 AS DOUBLE)]) AS vals
           FROM daily GROUP BY event_type),
         st AS (
           SELECT event_type, n_days,
                  list_reduce(vals, (a, x) ->
                    [x[1] * 0.5 + (a[1] + a[2]) * 0.5,
                     ((x[1] * 0.5 + (a[1] + a[2]) * 0.5) - a[1]) * 0.5
                       + a[2] * 0.5]) AS f
           FROM seqs)
         SELECT event_type, n_days,
                CAST(CAST(f[1] AS DECIMAL(18,6)) AS DOUBLE) AS level,
                CAST(CAST(f[2] AS DECIMAL(18,6)) AS DOUBLE) AS trend,
                CAST(CAST(f[1] + 7.0 * f[2] AS DECIMAL(18,6)) AS DOUBLE)
                  AS forecast_7d
         FROM st ORDER BY event_type""",

    // w10's list_reduce fold on every prefix vals[1:k]; one-step pred vs
    // vals[k+1]; errors decimal-pinned before the mean
    "w14_holt_backtest" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL
           GROUP BY 1, 2),
         seqs AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  list_transform(list({'day': day, 'v': v} ORDER BY day),
                    x -> [CAST(x.v AS DOUBLE), CAST(0.0 AS DOUBLE)]) AS vals
           FROM daily GROUP BY event_type),
         folds AS (
           SELECT event_type, n_days, vals,
                  unnest(generate_series(8, n_days - 1)) AS k
           FROM seqs WHERE n_days > 8),
         scored AS (
           SELECT event_type, n_days, k,
                  list_reduce(vals[1:CAST(k AS INT)], (a, x) ->
                    [x[1] * 0.5 + (a[1] + a[2]) * 0.5,
                     ((x[1] * 0.5 + (a[1] + a[2]) * 0.5) - a[1]) * 0.5
                       + a[2] * 0.5]) AS f,
                  vals[CAST(k + 1 AS INT)][1] AS actual
           FROM folds),
         errs AS (
           SELECT event_type, n_days,
                  CAST(f[1] + f[2] - actual AS DECIMAL(18,6)) AS err
           FROM scored)
         SELECT event_type, n_days, CAST(count(*) AS BIGINT) AS n_folds,
                CAST(sum(abs(err)) AS DOUBLE) / count(*) AS mae_cents,
                CAST(sum(err) AS DOUBLE) / count(*) AS bias_cents
         FROM errs GROUP BY event_type, n_days
         ORDER BY event_type""",

    // same long-pair slopes, same st8 smallest-value median rule
    "w11_theil_sen" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         slopes AS (
           SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
                    AS slope,
                  CAST(count(*) AS BIGINT) AS w
           FROM daily a JOIN daily b ON a.day < b.day GROUP BY 1),
         cum AS (
           SELECT slope, w,
                  CAST(sum(w) OVER (ORDER BY slope ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
                  CAST(sum(w) OVER () AS BIGINT) AS totw
           FROM slopes)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
                CAST(max(totw) AS BIGINT) AS n_pairs,
                min(slope) AS slope_med
         FROM cum WHERE cumw * 2 >= totw""",

    // same integer detrend X = 7v − Σ₇v, same ordered dow-term fold
    "w12_seasonal_strength" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         det AS (
           SELECT event_type, day % 7 AS dow, v * 7 - s7 AS x
           FROM (SELECT event_type, day, v,
                        CAST(count(*) OVER w7 AS BIGINT) AS nw,
                        CAST(sum(v) OVER w7 AS BIGINT) AS s7
                 FROM daily
                 WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
           WHERE nw = 7),
         tot AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
           FROM det GROUP BY event_type),
         seas AS (
           SELECT event_type,
                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                           / CAST(nw AS DOUBLE) ORDER BY dow)),
                    (a, b) -> a + b) AS sst
           FROM (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nw,
                        CAST(sum(x) AS BIGINT) AS sw
                 FROM det GROUP BY 1, 2)
           GROUP BY event_type)
         SELECT t.event_type, t.n,
                CAST(CAST(CASE WHEN CAST(q AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE) > 0.0
                     THEN greatest(0.0, 1.0 -
                       (CAST(q AS DOUBLE) - sst) /
                         (CAST(q AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                             / CAST(n AS DOUBLE)))
                     END AS DECIMAL(18,6)) AS DOUBLE) AS seasonal_strength
         FROM tot t JOIN seas s ON t.event_type = s.event_type
         ORDER BY t.event_type""",
  )
}
