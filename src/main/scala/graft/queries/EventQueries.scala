package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Num}

/** Streaming-shaped operators over `events`, in batch form (SURVEY §2.10:
  * the reference is pure batch, so streaming is our extension; the same
  * plans run under readStream in [[graft.streaming]] — tested there with
  * MemoryStream, since a streaming sink can't be oracle-diffed by DuckDB).
  *
  * `ts` arrives as nanos-epoch BIGINT (nanosAsLong): all window math is
  * integer arithmetic — immune to both timestamp-zone and double-precision
  * traps, and identical in any engine.
  */
object EventQueries extends QueryPack {

  private val HOUR_NS = 3600L * 1000 * 1000 * 1000
  private val DAY_NS = 24L * HOUR_NS // fa2 cohort bucket (the corpus spans days, not months)
  private val GAP_NS = 30L * 60 * 1000 * 1000 * 1000 // 30 min session gap
  private val LAG_US = 10L * 60 * 1000 * 1000        // 10 min interval-join lag
  private val FUNNEL_W_US = 24L * 3600 * 1000 * 1000 // e13 conversion window

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling hourly window per event type (streaming: groupBy(window(...)))
    // NB: integer DIV, not `/` — double division of nanos-epoch longs
    // (1.7e18) loses precision below the hour boundary.
    "e1_tumbling_hourly" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(expr(s"ts DIV $HOUR_NS").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
        .orderBy("hour_bucket", "event_type")),

    // Sliding window (1 h length, 30 min slide): every event lands in the
    // two windows covering it — the batch form of
    // groupBy(window(ts, "1 hour", "30 minutes")). The fan-out is a narrow
    // 2-element explode; the aggregate shuffles on the small window domain.
    "e5_sliding_hourly" -> ((s, d) => {
      val slideNs = HOUR_NS / 2
      Tables.events(s, d)
        .select(col("event_type"), col("value"),
          explode(array(
            expr(s"ts DIV $slideNs"),
            expr(s"ts DIV $slideNs") - 1)).as("slide_idx"))
        .groupBy(col("slide_idx"), col("event_type"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
        .orderBy("slide_idx", "event_type")
    }),

    // Interval join (streaming analog: StreamOps.intervalJoin with two
    // watermarks): each error ⋈ same-user clicks in the preceding 10 min.
    // µs integer arithmetic end-to-end (oracle discipline); the equi-key
    // on user_id keeps the range condition a post-join filter on a hash
    // join, never a cartesian.
    // Stream–static enrichment (batch twin of StreamOps.enrich): every
    // event picks up its user's dim attributes via a BROADCAST join — the
    // one join shape that is shuffle-free on the 100-TB fact side and, in
    // the streaming form, needs no watermark (static side re-broadcast per
    // micro-batch).
    "e7_stream_static_enrich" -> ((s, d) => {
      val dim = Tables.customer(s, d).select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"), col("c_nationkey").as("nation_key"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .join(broadcast(dim), Seq("user_id"))
        .orderBy("event_id")
    }),

    // Funnel / ordered-sequence matching: per user, the earliest
    // view → (later) click → (later) purchase chain, plus the funnel
    // depth reached. Three unbounded-frame window mins over ONE user_id
    // shuffle (no orderBy in the frame ⇒ no sort), each step's predicate
    // anchored on the previous step's timestamp — the sequential
    // dependency that makes funnels awkward in plain aggregation.
    "fa1_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("t"))
      val staged = ev
        .withColumn("t1", min(when(col("event_type") === "view", col("t"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("t") > col("t1"), col("t"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("t") > col("t2"), col("t"))).over(w))
      staged.groupBy("user_id")
        .agg(min("t1").as("t_view"), min("t2").as("t_click"),
          min("t3").as("t_purchase"))
        .withColumn("depth",
          when(col("t_purchase").isNotNull, 3)
            .when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1).otherwise(0))
        .orderBy("user_id")
    }),

    // Cohort retention (the classic product-analytics matrix): users are
    // cohorted by first-active day, and each (cohort_day, day_offset) cell
    // counts how many of that cohort were active that many days later.
    // Scale shape: ONE wide exchange — repartition(user_id) satisfies both
    // the (user, day) distinct (user_id ⊆ grouping keys ⇒ clustered
    // distribution already met, no second exchange) and the per-user
    // min-day cohort window; the cell aggregate then re-keys on the tiny
    // day×offset domain, map-side combined. The naive
    // distinct→groupBy→self-join spelling pays three wide exchanges.
    "fa2_cohort_retention" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), expr(s"ts DIV $DAY_NS").as("day"))
        .repartition(col("user_id"))
        .distinct()
        .withColumn("cohort_day", min(col("day")).over(w))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Rolling engagement (DAU + trailing-7-day WAU per day). The rolling
    // DISTINCT is the trap: count(DISTINCT user) OVER (RANGE 7 days) has
    // no scalable window form, and per-day user sets don't merge under a
    // rolling sum (a user active twice in the window must count once).
    // Spelling: distinct (user, day) → explode each row to the ≤7 target
    // days it keeps the user "weekly active" for → re-distinct (user,
    // target) → count per target. Two keyed exchanges on user-scale data,
    // both map-side combined; the 7× fan-out is a narrow int explode.
    // The calendar semi-join (targets must be observed days, not phantom
    // days past the corpus end) broadcasts the DAY domain — bounded by
    // time (O(years) rows), not by data size, so it stays broadcastable
    // at 100 TB, unlike a user- or node-scale frame.
    "e14_rolling_active" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts DIV $DAY_NS").as("day"))
        .distinct()
      val cal = days.select(col("day").as("target")).distinct()
      val dau = days.groupBy("day").agg(count(lit(1)).as("n_dau"))
      val wau = days
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("target"))
        .join(broadcast(cal), "target", "left_semi")
        .distinct()
        .groupBy(col("target").as("day")).agg(count(lit(1)).as("n_wau"))
      dau.join(wau, "day").orderBy("day")
    }),

    // Daily-volume spike detection — the ingest-monitoring query (a
    // crawler burst, a dup-bomb, a broken source all surface as one
    // day's count jumping off its own trailing baseline). Per (type,
    // day) counts, then a trailing-7-day RANGE window (value-based, so a
    // missing calendar day can never slide a stale count into the
    // baseline) and an integer-only spike test: n·7 > 2·trailing_total —
    // i.e. a day above 2× its trailing mean — gated on a FULL 7-day
    // baseline. Everything stays integer: no doubles anywhere, so the
    // flag is trivially hash-exact. Seeding (t7/mm4 precedent: the
    // uniform synthetic corpus would never spike and the flag would pass
    // vacuously): error events on days ≡ 3 (mod 7) count 3× — a
    // deterministic row-local weight, so the spike provably fires and
    // the window provably absorbs it back into the baseline. Scale: one
    // map-side-combined aggregate to O(types × days) rows, then a
    // type-keyed window over O(days) rows each.
    "e15_spike_days" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("day")
        .rangeBetween(-7, -1)
      Tables.events(s, d)
        .select(col("event_type"), expr(s"ts DIV $DAY_NS").as("day"))
        .withColumn("wt",
          when(col("event_type") === "error" && col("day") % 7 === 3, 3L)
            .otherwise(1L))
        .groupBy("event_type", "day").agg(sum(col("wt")).as("n"))
        .select(col("event_type"), col("day"), col("n"),
          coalesce(sum(col("n")).over(w), lit(0L)).as("trail_total"),
          count(lit(1)).over(w).as("trail_days"))
        .withColumn("is_spike",
          col("trail_days") === 7 && col("n") * 7 > col("trail_total") * 2)
        .orderBy("event_type", "day")
    }),

    // Day-of-week seasonal baseline — e15's complement: e15's trailing
    // window flags ANY local surge, including a perfectly normal Monday
    // after a quiet weekend; this one compares each day against its own
    // weekday class mean, so weekly seasonality is absorbed (e15's seeded
    // 3× error days land on ONE dow class and are its baseline — they
    // flag there, not here; that contrast is the query's point).
    // Integer-only test (n·dow_days·4 > dow_total·5 ⟺ n > 1.25·mean) plus
    // the deviation itself in ppm. The daily aggregate is the only
    // data-scale work; the dow window runs over the time-bounded day
    // table (st3/e14 discipline).
    // Inter-event gap distribution per event type — the telemetry-health
    // readout (a collapsing median gap = a runaway client; a fat p90 = a
    // stalling one) no other event op covers. One user-keyed window
    // (lag over (ts, event_id) — the id tiebreak makes same-timestamp
    // pairs deterministic) computes whole-second integer gaps, then the
    // a13 cell discipline: ONE (type, gap)-keyed aggregate is the only
    // data-scale work; median (2·cum ≥ tot) and p90 (10·cum ≥ 9·tot)
    // come from cumulative windows over the bounded gap-cell table. All
    // integers, nothing divides.
    "e17_interevent_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cells = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"),
          expr("(ts - prev) DIV 1000000000").as("gap_s"))
        .groupBy("event_type", "gap_s").agg(count(lit(1)).as("n"))
      val byT = Window.partitionBy("event_type")
      val cum = byT.orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("cumn", sum(col("n")).over(cum))
        .withColumn("tot", sum(col("n")).over(byT))
        .groupBy("event_type")
        .agg(max(col("tot")).as("n_gaps"),
          min(when(col("cumn") * 2 >= col("tot"), col("gap_s")))
            .as("median_gap_s"),
          min(when(col("cumn") * 10 >= col("tot") * 9, col("gap_s")))
            .as("p90_gap_s"))
        .orderBy("event_type")
    }),

    // Lag-1..7 autocorrelation of the daily count series per event type —
    // the seasonality DETECTOR beside e16's dow-class corrector (a strong
    // acf spike at lag 7 is how a pipeline learns the weekly period it
    // should baseline against, instead of assuming it). Exact integer
    // algebra end to end: with nd days and total S, the centered value
    // rides as the scaled integer cc_d = nd·x_d − S (= nd·(x_d − mean),
    // so the nd² factors cancel in num/den and no rational mean ever
    // materializes); ONE double division at the end. The only data-scale
    // work is the (type, day) aggregate — the lag self-join runs on the
    // calendar-bounded type×day grid (30·5 rows here, 7·|days| pairs per
    // type), never on events.
    "e18_autocorr" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .select(col("event_type"), expr(s"ts DIV $DAY_NS").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      val tot = cells.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum(col("x")).as("s"))
      val cent = cells.join(tot, "event_type")
        .select(col("event_type"), col("day"),
          (col("nd") * col("x") - col("s")).as("cc"))
      val den = cent.groupBy("event_type")
        .agg(sum(col("cc") * col("cc")).as("den"))
      val lags = cent.select(col("event_type"), col("day"), col("cc"),
          explode(sequence(lit(1), lit(7))).as("lag"))
        .withColumn("lag", col("lag").cast("bigint"))
      lags.as("a")
        .join(cent.as("b"),
          col("b.event_type") === col("a.event_type") &&
            col("b.day") === col("a.day") - col("a.lag"))
        .groupBy(col("a.event_type"), col("a.lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.cc") * col("b.cc")).as("num"))
        .join(den, "event_type")
        .select(col("event_type"), col("lag"), col("n_pairs"),
          (col("num").cast("double") / col("den").cast("double")).as("acf"))
        .orderBy("event_type", "lag")
    }),

    "e16_dow_baseline" -> ((s, d) => {
      val w = Window.partitionBy("event_type", "dow")
      Tables.events(s, d)
        .select(col("event_type"), expr(s"ts DIV $DAY_NS").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        .withColumn("dow", col("day") % 7)
        .withColumn("dow_total", sum(col("n")).over(w))
        .withColumn("dow_days", count(lit(1)).over(w))
        .withColumn("dev_ppm", expr("(1000000 * n * dow_days) div dow_total"))
        .withColumn("is_high",
          col("n") * col("dow_days") * 4 > col("dow_total") * 5)
        .select("event_type", "day", "dow", "n", "dev_ppm", "is_high")
        .orderBy("event_type", "day")
    }),

    // LEFT OUTER interval join (batch twin of StreamOps.intervalJoinOuter):
    // errors with no click in [ets - lag, ets] still emit with a null
    // click — same binnable-range plan as e6, plus the null row per
    // unmatched error the outer semantics add.
    "e8_interval_join_outer" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          expr("ts DIV 1000").as("ets_us"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          expr("ts DIV 1000").as("cts_us"))
      err.join(clk, col("user_id") === col("c_user") &&
          col("cts_us") >= col("ets_us") - lit(LAG_US) &&
          col("cts_us") <= col("ets_us"), "left_outer")
        .select(col("error_id"), col("click_id"),
          (col("ets_us") - col("cts_us")).as("lag_us"))
        .orderBy("error_id", "click_id")
    }),

    "e6_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          expr("ts DIV 1000").as("ets_us"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          expr("ts DIV 1000").as("cts_us"))
      err.join(clk, Seq("user_id"))
        .filter(col("cts_us") >= col("ets_us") - lit(LAG_US) &&
          col("cts_us") <= col("ets_us"))
        .select(col("error_id"), col("click_id"),
          (col("ets_us") - col("cts_us")).as("lag_us"))
        .orderBy("error_id", "click_id")
    }),

    // Sessionization: 30-min-gap sessions per user (streaming analog:
    // flatMapGroupsWithState) — one shuffle on user_id, lag + running sum.
    "e2_sessionize" -> ((s, d) => {
      // Compare at µs like the oracle (DuckDB truncates TIMESTAMP_NS to µs).
      val tsUs = expr("ts DIV 1000")
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("new_sess",
          when(tsUs - lag(tsUs, 1).over(byUser) > GAP_NS / 1000, 1)
            .when(lag(tsUs, 1).over(byUser).isNull, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(sum(col("new_sess")).cast("bigint").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Streaming dedup (dropDuplicates analog): earliest event per
    // (user_id, event_type), deterministic tie-break.
    "e3_dedup_keep_earliest" -> ((s, d) =>
      Dedup.keepFirst(Tables.events(s, d), Seq("user_id", "event_type"),
        Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"),
          expr("ts DIV 1000").as("first_ts_us"))
        .orderBy("user_id", "event_type")),

    // Gaps-and-islands DETAIL: e2 counts sessions per user; this emits one
    // row per session (island) with its boundaries — the classic
    // lag→mark→cumulative-sum→group chain. ONE exchange on user_id total:
    // both windows share it, and the island aggregate's grouping keys
    // (user_id, session_no) are a superset of the partitioning key, so
    // Catalyst plans partial+final HashAggregate with NO re-exchange
    // (PLANS.md) — at 100 TB the cost is the same single wide shuffle
    // as e2.
    "e9_session_islands" -> ((s, d) => {
      val tsUs = expr("ts DIV 1000")
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(tsUs - lag(tsUs, 1).over(byUser) > GAP_NS / 1000, 1)
            .when(lag(tsUs, 1).over(byUser).isNull, 1)
            .otherwise(0))
        .withColumn("session_no", sum(col("new_sess")).over(cum).cast("bigint"))
        .groupBy("user_id", "session_no")
        .agg(min(tsUs).as("start_us"), max(tsUs).as("end_us"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_no")
    }),

    // e9's islands through Spark's BUILT-IN session_window (the batch form
    // of the streaming session operator): same single user_id exchange, the
    // session merge runs inside SessionWindow/ObjectHashAggregate instead
    // of a window chain. Boundary semantics differ from e9 at EXACT gap:
    // session_window windows are half-open [t, t+gap), so a delta of
    // exactly the gap starts a NEW session (e9's `>` keeps it) — the
    // oracle encodes `>=` to pin the built-in's semantics honestly, and
    // end_us = last event + gap per the window definition.
    "e10_session_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ets_ts", timestamp_micros(expr("ts DIV 1000")))
      ev.groupBy(col("user_id"), session_window(col("ets_ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("n_events"))
        .orderBy("user_id", "start_us")
    }),

    // Regular-grid resample + forward fill (pandas resample().ffill(),
    // time_bucket_gapfill): hourly slots per user across the corpus's
    // 30-day span, each carrying the user's latest event value at or
    // before the slot. Grid = narrow sequence-explode off a |users|-row
    // bounds aggregate; fill = the as-of operator — total cost is ONE
    // keyed shuffle regardless of grid density ([[graft.ops.Resample]]).
    "e11_resample_ffill" -> ((s, d) => {
      val pts = Tables.events(s, d)
        .groupBy(col("user_id"), expr("ts DIV 1000").as("ets"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
      graft.ops.Resample.gridFfill(pts, Seq("user_id"), "ets",
          HOUR_NS / 1000, Seq("value_ffill" -> col("v")))
        .select(col("user_id"), col("t_grid"), col("value_ffill"))
        .orderBy("user_id", "t_grid")
    }),

    // Linear interpolation at grid slots — the other half of resampling
    // (e11 = ffill): backward as-of carries (t_prev, v_prev), forward
    // as-of carries (t_next, v_next), and the interp is one fixed double
    // expression tree — identical under IEEE in any engine, so it
    // hash-matches DuckDB computing the same formula from its native
    // ASOF joins. Semantics: a slot ON a point takes that value; a slot
    // missing either neighbor (before a key's first point / after its
    // last) is NULL; two as-of shuffles total, grid stays generated.
    "e12_resample_interp" -> ((s, d) => {
      val hourUs = HOUR_NS / 1000
      val pts = Tables.events(s, d)
        .groupBy(col("user_id"), expr("ts DIV 1000").as("ets"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
      val back = graft.ops.Resample.gridFfill(pts, Seq("user_id"), "ets",
        hourUs, Seq("v_prev" -> col("v"), "t_prev" -> col("ets")))
      val both = graft.plans.NativeAsOf.asofJoinForward(back, pts,
        Seq("user_id"), "t_grid", "ets",
        Seq("v_next" -> "v", "t_next" -> "ets"))
      both.select(col("user_id"), col("t_grid"),
          when(col("t_prev") === col("t_next"), col("v_prev"))
            .when(col("t_prev").isNotNull && col("t_next").isNotNull,
              col("v_prev") + (col("v_next") - col("v_prev")) *
                ((col("t_grid") - col("t_prev")) /
                 (col("t_next") - col("t_prev"))))
            .as("value_interp"))
        .orderBy("user_id", "t_grid")
    }),

    // Late-data accounting: per type, events arriving out of order w.r.t.
    // the running max timestamp (what a watermark would drop/admit).
    "e4_out_of_order_frac" -> ((s, d) => {
      val byType = Window.partitionBy("event_type").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tsUs = expr("ts DIV 1000")
      Tables.events(s, d)
        .withColumn("late",
          when(tsUs < max(tsUs).over(byType), 1).otherwise(0))
        .groupBy("event_type")
        .agg(sum(col("late")).cast("bigint").as("n_late"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Ordered conversion funnel (view → click → purchase, 24 h windows):
    // each stage's timestamp is the earliest event of that kind STRICTLY
    // AFTER the previous stage and WITHIN the conversion window — the
    // order- and recency-sensitive definition (a purchase before the
    // first qualifying click, or a week later, does not convert; window
    // tuned so every stage outcome fires at gate scale: 25 purchase / 35
    // click-only / 90 stall at sf0.01). Three keyed min-aggregates, each
    // joined forward; every exchange is on user_id so AQE coalesces them
    // onto one clustering, and all time math is integer micros
    // (engine-exact). At 100 TB this is the canonical "funnel without a
    // per-user sort": no window over full event history, only min()s.
    "e13_funnel" -> ((s, d) => {
      val tsUs = expr("ts DIV 1000")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), tsUs.as("us"))
      val tv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t_view"))
      val tc = ev.filter(col("event_type") === "click")
        .join(tv, Seq("user_id"))
        .filter(col("us") > col("t_view") &&
          col("us") <= col("t_view") + lit(FUNNEL_W_US))
        .groupBy("user_id").agg(min(col("us")).as("t_click"))
      val tp = ev.filter(col("event_type") === "purchase")
        .join(tc, Seq("user_id"))
        .filter(col("us") > col("t_click") &&
          col("us") <= col("t_click") + lit(FUNNEL_W_US))
        .groupBy("user_id").agg(min(col("us")).as("t_purchase"))
      ev.select("user_id").distinct()
        .join(tv, Seq("user_id"), "left")
        .join(tc.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
        .join(tp, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("t_purchase").isNotNull, 3)
            .when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1).otherwise(0))
        .orderBy("user_id")
    }),

    // First-order Markov transition matrix over each user's event
    // sequence (path analytics): adjacent (event → next event) pairs via
    // one user-keyed window lead, counted into a |types|² matrix, with
    // row-normalized transition probability. One user-keyed exchange for
    // the lead + one map-side-combined pair aggregate; the per-row totals
    // table is |types| rows and broadcasts. p = n/n_cur is a single
    // int÷int double division — IEEE-exact cross-engine, no pin needed.
    "pa1_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ets", "event_id")
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("ets"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
      val cnt = pairs.groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("cur").agg(sum(col("n")).as("n_cur"))
      cnt.join(broadcast(tot), "cur")
        .withColumn("p", col("n").cast("double") / col("n_cur").cast("double"))
        .select("cur", "nxt", "n", "p")
        .orderBy("cur", "nxt")
    }),

    // Sequence mining tier above pa1: top-20 event-type TRIGRAMS (the
    // "what do users do next next" question funnels can't answer). Two
    // leads share pa1's single user-keyed window exchange; the trigram
    // aggregate re-keys on the ≤|types|³ domain, map-side combined; the
    // final top-k is orderBy+limit ⇒ TakeOrdered (per-partition heaps +
    // driver merge of 20-row heads — no global sort materializes, the s1
    // discipline). The tiebreak on (t1,t2,t3) makes the 20-row cut
    // deterministic cross-engine: trigram keys are unique in `c`, so no
    // two rows compare equal under (n DESC, t1, t2, t3).
    "pa2_top_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ets", "event_id")
      val tri = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("ets"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
      tri.groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
    }),

    // Recency-decayed engagement score, 7-day half-life: the "who is
    // active NOW" ranking a retention pipeline feeds (a plain lifetime sum
    // ranks a long-dead whale above a rising user). Exactness discipline:
    // the decay 2^(-age_weeks) is a POWER OF TWO on the integer week grid,
    // so the factor is one truncated integer ppm (10^6 div 2^w, capped at
    // w=20 where it hits 0) — no pow(), no float drift, both engines
    // produce the same BIGINT score. Scale shape: window-free — a 1-row
    // max-day broadcast, ONE user-keyed aggregate, TakeOrdered top-20;
    // score unit is cents·ppm.
    "e19_decayed_engagement" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        expr(s"ts DIV $DAY_NS").as("day"),
        round(col("value") * 100).cast("bigint").as("cents"))
      val mx = ev.agg(max(col("day")).as("maxd"))
      ev.crossJoin(broadcast(mx))
        .withColumn("factor", expr(
          "1000000 div shiftleft(CAST(1 AS BIGINT)," +
            " least((maxd - day) div 7, 20))"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).as("raw_cents"),
          sum(col("cents") * col("factor")).as("decayed_score"))
        .orderBy(col("decayed_score").desc, col("user_id")).limit(20)
    }),

    // RFM segmentation — the classic lifecycle scoring (recency /
    // frequency / monetary quintiles per purchaser). The scale trap in
    // every naive RFM job is three GLOBAL rank windows over the user
    // table (single-partition sort at 1e9 users); here quintile
    // BREAKPOINTS are derived instead from per-metric cell tables
    // (metric value → user count — bounded by the value domain: calendar
    // days for R, max purchase count for F, $10 bins for M), then the 12
    // breakpoint constants broadcast back onto the user table as row-
    // local comparisons. Everything is integer: the quintile rule is
    // st9's smallest-value form (b_q = min v with 5·cum ≥ q·total), a
    // score is 1 + #breakpoints strictly below the value. Scores run 1–5
    // ascending in the RAW metric (a marketer reads R inverted; the
    // engine stays monotone).
    "e21_rfm_scores" -> ((s, d) => {
      val pu = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), expr(s"ts DIV $DAY_NS").as("day"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .groupBy("user_id")
        .agg(max(col("day")).as("lastd"), count(lit(1)).as("freq"),
          sum(col("cents")).as("mon"))
      val maxd = pu.agg(max(col("lastd")).as("maxd"))
      val u = pu.crossJoin(broadcast(maxd))
        .select(col("user_id"), (col("maxd") - col("lastd")).as("rec"),
          col("freq"), expr("mon div 1000").as("monb"))
      // one 4-breakpoint row per metric, from the domain-bounded cells
      def breaks(metric: String, pfx: String): DataFrame = {
        val ord = Window.orderBy(metric)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cells = u.groupBy(metric).agg(count(lit(1)).as("w"))
          .withColumn("cumw", sum(col("w")).over(ord))
          .withColumn("tot", sum(col("w")).over(Window.partitionBy()))
        val mins = (1 to 4).map(q =>
          min(when(col("cumw") * 5 >= col("tot") * q, col(metric)))
            .as(s"$pfx$q"))
        cells.agg(mins.head, mins.tail: _*)
      }
      u.crossJoin(broadcast(breaks("rec", "rb")))
        .crossJoin(broadcast(breaks("freq", "fb")))
        .crossJoin(broadcast(breaks("monb", "mb")))
        .select(col("user_id"), col("rec"), col("freq"), col("monb"),
          (lit(1) + (1 to 4).map(q =>
            (col("rec") > col(s"rb$q")).cast("int")).reduce(_ + _))
            .as("r_q"),
          (lit(1) + (1 to 4).map(q =>
            (col("freq") > col(s"fb$q")).cast("int")).reduce(_ + _))
            .as("f_q"),
          (lit(1) + (1 to 4).map(q =>
            (col("monb") > col(s"mb$q")).cast("int")).reduce(_ + _))
            .as("m_q"))
        .orderBy("user_id")
    }),

    // Longest consecutive-day activity streak per user — the retention
    // metric behind "7-day streak" product mechanics, and the classic
    // gaps-and-islands exercise e9 applies to sessions, lifted to the
    // day grid. ONE distinct (user, day) aggregate bounds every window
    // by per-user history (the e9 partitioning — never a global sort);
    // islands via the lag-break cumulative sum, then two bounded
    // roll-ups. All integers.
    "e22_activity_streaks" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts DIV $DAY_NS").as("day")).distinct()
      val byU = Window.partitionBy("user_id").orderBy("day")
      val cum = byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days
        .withColumn("brk",
          when(col("day") - lag("day", 1).over(byU) === 1, 0).otherwise(1))
        .withColumn("island", sum(col("brk")).over(cum))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum(col("len")).as("active_days"),
          count(lit(1)).as("n_streaks"), max(col("len")).as("max_streak"))
        .orderBy("user_id")
    }),

    // Burstiness (Fano factor) of each user's daily event counts —
    // variance-to-mean over OBSERVED days (absent days are "no visit",
    // not zero-activity, and counting them would make the statistic
    // depend on the corpus span; documented choice). F≈1 is Poisson
    // arrivals, >1 bursty, <1 regular — the bot-vs-human cadence signal.
    // INTEGER-exact: F = (n·Σx² − (Σx)²) / ((n−1)·Σx) in ppm, products
    // in decimal(38,0)/HUGEINT (Σx² crosses 2^63 at 100-TB per-user
    // volumes). ONE keyed aggregate over the daily cells; no window.
    "e23_fano_burstiness" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), expr(s"ts DIV $DAY_NS").as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("x"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total_events"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sx2"))
        .filter(col("n_days") >= 2)
        .select(col("user_id"), col("n_days"), col("total_events"),
          expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) *
                    (n_days * sx2 - CAST(total_events AS DECIMAL(38,0))
                       * total_events))
                  div ((n_days - 1) *
                    CAST(total_events AS DECIMAL(38,0))) AS BIGINT)""")
            .as("fano_ppm"))
        .orderBy("user_id")),

    // Activity-tier transition matrix between consecutive 10-day periods
    // — the lifecycle Markov readout (how many low-activity users climb
    // to high, how many churn toward low) a retention team watches.
    // Tiers are count bins per (user, period); transitions pair each
    // observed period with the user's NEXT observed period via ONE
    // self-join on (user, period+1) — user-keyed, so at 100 TB it rides
    // the same partitioning as the tier aggregate; the matrix is
    // domain-bounded (tiers²) and the share-of-row ppm is a window over
    // ≤9 cells. Absent periods drop (e23's observed-only rule).
    "e24_tier_transitions" -> ((s, d) => {
      val tiers = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts DIV $DAY_NS DIV 10").as("period"))
        .groupBy("user_id", "period").agg(count(lit(1)).as("x"))
        .select(col("user_id"), col("period"),
          when(col("x") < 18, "low").when(col("x") < 26, "mid")
            .otherwise("high").as("tier"))
      val nxt = tiers.select(col("user_id"),
        (col("period") - 1).as("period"), col("tier").as("tier_to"))
      val m = tiers.join(nxt, Seq("user_id", "period"))
        .groupBy(col("tier").as("tier_from"), col("tier_to"))
        .agg(count(lit(1)).as("n_users"))
      m.withColumn("row_total",
          sum(col("n_users")).over(Window.partitionBy("tier_from")))
        .select(col("tier_from"), col("tier_to"), col("n_users"),
          expr("(1000000 * n_users) div row_total").as("share_ppm"))
        .orderBy("tier_from", "tier_to")
    }),

    // Conversion lag: seconds from a user's FIRST click to their first
    // purchase at-or-after it — the time-to-convert distribution every
    // growth dashboard plots next to the e13 funnel (which gates on a
    // fixed window; this measures the actual delay). ONE user-keyed
    // aggregate computes both firsts as conditional mins — no join, no
    // window, no second pass over events — then a row-local filter keeps
    // converters. Lag is integer nanos floor-divided to whole seconds.
    // Users whose only purchases precede their first click are honestly
    // non-converters here (the purchase wasn't attributable to a click);
    // they drop with the never-purchased.
    "e20_conversion_lag" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "click", col("ts"))).as("c0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("p0"))
        .filter(col("c0").isNotNull && col("p0").isNotNull &&
          col("p0") >= col("c0"))
        .select(col("user_id"),
          expr("(p0 - c0) div 1000000000").as("lag_s"))
        .orderBy("user_id")),
  )

  // e21 oracle helper: the 4-breakpoint CTE body for one metric
  private def rfmBreaksSql(metric: String, pfx: String): String = {
    val mins = (1 to 4).map(q =>
      s"min(CASE WHEN cumw * 5 >= tot * $q THEN $metric END) AS $pfx$q")
      .mkString(", ")
    s"""SELECT $mins
        FROM (SELECT $metric,
                     CAST(sum(w) OVER (ORDER BY $metric ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
                     CAST(sum(w) OVER () AS BIGINT) AS tot
              FROM (SELECT $metric, CAST(count(*) AS BIGINT) AS w
                    FROM u GROUP BY $metric))"""
  }

  private def rfmScoreSql(metric: String, pfx: String): String =
    s"CAST(1 + ${(1 to 4).map(q =>
      s"(CASE WHEN $metric > $pfx$q THEN 1 ELSE 0 END)").mkString(" + ")} AS INT)"

  val oracles: Map[String, String] = Map(
    "e22_activity_streaks" ->
      """WITH days AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         brk AS (
           SELECT user_id, day,
                  CASE WHEN day - lag(day) OVER (PARTITION BY user_id
                    ORDER BY day) = 1 THEN 0 ELSE 1 END AS b
           FROM days),
         isl AS (
           SELECT user_id, day,
                  CAST(sum(b) OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS island
           FROM brk),
         st AS (
           SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
           FROM isl GROUP BY 1, 2)
         SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
                CAST(count(*) AS BIGINT) AS n_streaks,
                CAST(max(len) AS BIGINT) AS max_streak
         FROM st GROUP BY user_id ORDER BY user_id""",

    "e23_fano_burstiness" ->
      """WITH cells AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         agg AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(x) AS BIGINT) AS total_events,
                  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2
           FROM cells GROUP BY user_id)
         SELECT user_id, n_days, total_events,
                CAST((CAST(1000000 AS HUGEINT) *
                       (n_days * sx2 - CAST(total_events AS HUGEINT)
                          * total_events))
                     // ((n_days - 1) * CAST(total_events AS HUGEINT))
                  AS BIGINT) AS fano_ppm
         FROM agg WHERE n_days >= 2 ORDER BY user_id""",

    "e24_tier_transitions" ->
      """WITH tiers AS (
           SELECT user_id, (epoch_us(ts) // 86400000000) // 10 AS period,
                  CASE WHEN count(*) < 18 THEN 'low'
                       WHEN count(*) < 26 THEN 'mid'
                       ELSE 'high' END AS tier
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT a.tier AS tier_from, b.tier AS tier_to,
                  CAST(count(*) AS BIGINT) AS n_users
           FROM tiers a JOIN tiers b
             ON a.user_id = b.user_id AND b.period = a.period + 1
           GROUP BY 1, 2)
         SELECT tier_from, tier_to, n_users,
                CAST((1000000 * n_users) //
                  CAST(sum(n_users) OVER (PARTITION BY tier_from) AS BIGINT)
                  AS BIGINT) AS share_ppm
         FROM m ORDER BY tier_from, tier_to""",

    "e21_rfm_scores" ->
      s"""WITH pu AS (
            SELECT user_id,
                   max(epoch_us(ts) // 86400000000) AS lastd,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS mon
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY user_id),
          u AS (SELECT user_id,
                       (SELECT max(lastd) FROM pu) - lastd AS rec,
                       freq, mon // 1000 AS monb
                FROM pu),
          rb AS (${rfmBreaksSql("rec", "rb")}),
          fb AS (${rfmBreaksSql("freq", "fb")}),
          mb AS (${rfmBreaksSql("monb", "mb")})
          SELECT user_id, rec, freq, monb,
                 ${rfmScoreSql("rec", "rb")} AS r_q,
                 ${rfmScoreSql("freq", "fb")} AS f_q,
                 ${rfmScoreSql("monb", "mb")} AS m_q
          FROM u, rb, fb, mb ORDER BY user_id""",

    "e20_conversion_lag" ->
      """SELECT user_id,
                (epoch_us(p0) - epoch_us(c0)) // 1000000 AS lag_s
         FROM (SELECT user_id,
                      min(CASE WHEN event_type = 'click' THEN ts END) AS c0,
                      min(CASE WHEN event_type = 'purchase' THEN ts END) AS p0
               FROM events GROUP BY user_id)
         WHERE c0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= c0
         ORDER BY user_id""",

    "e13_funnel" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
          tv AS (SELECT user_id, min(us) AS t_view FROM ev
                 WHERE event_type = 'view' GROUP BY user_id),
          tc AS (SELECT ev.user_id, min(us) AS t_click FROM ev
                 JOIN tv ON ev.user_id = tv.user_id
                 WHERE event_type = 'click' AND us > t_view
                   AND us <= t_view + $FUNNEL_W_US
                 GROUP BY ev.user_id),
          tp AS (SELECT ev.user_id, min(us) AS t_purchase FROM ev
                 JOIN tc ON ev.user_id = tc.user_id
                 WHERE event_type = 'purchase' AND us > t_click
                   AND us <= t_click + $FUNNEL_W_US
                 GROUP BY ev.user_id)
          SELECT u.user_id, tv.t_view, tc.t_click, tp.t_purchase,
                 CAST(CASE WHEN tp.t_purchase IS NOT NULL THEN 3
                           WHEN tc.t_click IS NOT NULL THEN 2
                           WHEN tv.t_view IS NOT NULL THEN 1
                           ELSE 0 END AS INT) AS stage
          FROM (SELECT DISTINCT user_id FROM ev) u
          LEFT JOIN tv ON u.user_id = tv.user_id
          LEFT JOIN tc ON u.user_id = tc.user_id
          LEFT JOIN tp ON u.user_id = tp.user_id
          ORDER BY u.user_id""",
    "e7_stream_static_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value,
                c.c_mktsegment AS segment, c.c_nationkey AS nation_key
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY event_id""",
    "e6_interval_join" ->
      s"""WITH err AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS ets_us
                       FROM events WHERE event_type = 'error'),
              clk AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts_us
                      FROM events WHERE event_type = 'click')
          SELECT error_id, click_id, ets_us - cts_us AS lag_us
          FROM err JOIN clk USING (user_id)
          WHERE cts_us BETWEEN ets_us - $LAG_US AND ets_us
          ORDER BY error_id, click_id""",
    "fa2_cohort_retention" ->
      s"""WITH days AS (SELECT DISTINCT user_id,
                               epoch_us(ts) // ${DAY_NS / 1000} AS day
                        FROM events),
          cohort AS (SELECT user_id, min(day) AS cohort_day
                     FROM days GROUP BY user_id)
          SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
                 count(*) AS n_users
          FROM days d JOIN cohort c USING (user_id)
          GROUP BY 1, 2 ORDER BY cohort_day, day_offset""",
    "e14_rolling_active" ->
      s"""WITH days AS (SELECT DISTINCT user_id,
                               epoch_us(ts) // ${DAY_NS / 1000} AS day
                        FROM events),
          cal AS (SELECT DISTINCT day FROM days),
          dau AS (SELECT day, count(*) AS n_dau FROM days GROUP BY day),
          act AS (SELECT DISTINCT d.user_id, t.target
                  FROM days d,
                       unnest(generate_series(d.day, d.day + 6)) AS t(target)
                  WHERE t.target IN (SELECT day FROM cal)),
          wau AS (SELECT target AS day, count(*) AS n_wau
                  FROM act GROUP BY target)
          SELECT day, n_dau, n_wau
          FROM dau JOIN wau USING (day)
          ORDER BY day""",
    "e15_spike_days" ->
      s"""WITH daily AS (
            SELECT event_type, epoch_us(ts) // ${DAY_NS / 1000} AS day,
                   CAST(sum(CASE WHEN event_type = 'error'
                                  AND (epoch_us(ts) // ${DAY_NS / 1000}) % 7 = 3
                                 THEN 3 ELSE 1 END) AS BIGINT) AS n
            FROM events GROUP BY 1, 2)
          SELECT event_type, day, n,
                 CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS trail_total,
                 CAST(count(*) OVER w AS BIGINT) AS trail_days,
                 (count(*) OVER w = 7
                  AND n * 7 > coalesce(sum(n) OVER w, 0) * 2) AS is_spike
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
          ORDER BY event_type, day""",
    // lag over (ts, event_id) mirrored; whole-second gaps from micros
    // (every corpus ts is a whole microsecond — verified, and Spark's
    // nanos DIV 1e9 equals DuckDB's micros // 1e6 exactly then)
    "e17_interevent_gaps" ->
      """WITH gaps AS (
           SELECT event_type,
                  (epoch_us(ts) - epoch_us(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)))
                    // 1000000 AS gap_s
           FROM events),
         cells AS (SELECT event_type, gap_s, CAST(count(*) AS BIGINT) AS n
                   FROM gaps WHERE gap_s IS NOT NULL
                   GROUP BY 1, 2),
         cum AS (
           SELECT event_type, gap_s,
                  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY gap_s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumn,
                  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
           FROM cells)
         SELECT event_type, max(tot) AS n_gaps,
                min(CASE WHEN cumn * 2 >= tot THEN gap_s END) AS median_gap_s,
                min(CASE WHEN cumn * 10 >= tot * 9 THEN gap_s END) AS p90_gap_s
         FROM cum GROUP BY event_type ORDER BY event_type""",

    "e18_autocorr" ->
      s"""WITH cells AS (
            SELECT event_type, epoch_us(ts) // ${DAY_NS / 1000} AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
          tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
                         CAST(sum(x) AS BIGINT) AS s
                  FROM cells GROUP BY 1),
          cent AS (SELECT cells.event_type, day, nd * x - s AS cc
                   FROM cells JOIN tot USING (event_type)),
          den AS (SELECT event_type, CAST(sum(cc * cc) AS BIGINT) AS den
                  FROM cent GROUP BY 1),
          lags AS (SELECT event_type, day, cc,
                          unnest(generate_series(1, 7)) AS lag
                   FROM cent),
          num AS (SELECT a.event_type, a.lag,
                         CAST(count(*) AS BIGINT) AS n_pairs,
                         CAST(sum(a.cc * b.cc) AS BIGINT) AS num
                  FROM lags a JOIN cent b
                    ON b.event_type = a.event_type AND b.day = a.day - a.lag
                  GROUP BY 1, 2)
          SELECT event_type, lag, n_pairs,
                 CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
          FROM num JOIN den USING (event_type)
          ORDER BY event_type, lag""",

    "e16_dow_baseline" ->
      s"""WITH daily AS (
            SELECT event_type, epoch_us(ts) // ${DAY_NS / 1000} AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          d2 AS (SELECT *, day % 7 AS dow FROM daily)
          SELECT event_type, day, dow, n,
                 CAST((1000000 * n * CAST(count(*) OVER win AS BIGINT))
                      // CAST(sum(n) OVER win AS BIGINT) AS BIGINT) AS dev_ppm,
                 n * CAST(count(*) OVER win AS BIGINT) * 4
                   > CAST(sum(n) OVER win AS BIGINT) * 5 AS is_high
          FROM d2
          WINDOW win AS (PARTITION BY event_type, dow)
          ORDER BY event_type, day""",
    "fa1_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         v AS (SELECT user_id,
                 min(t) FILTER (WHERE event_type = 'view') AS t_view
               FROM e GROUP BY user_id),
         c AS (SELECT e.user_id,
                 min(e.t) FILTER (WHERE e.event_type = 'click'
                                    AND e.t > v.t_view) AS t_click
               FROM e JOIN v USING (user_id) GROUP BY e.user_id),
         p AS (SELECT e.user_id,
                 min(e.t) FILTER (WHERE e.event_type = 'purchase'
                                    AND e.t > c.t_click) AS t_purchase
               FROM e JOIN c USING (user_id) GROUP BY e.user_id)
         SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
                CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                          WHEN c.t_click IS NOT NULL THEN 2
                          WHEN v.t_view IS NOT NULL THEN 1
                          ELSE 0 END AS INT) AS depth
         FROM v JOIN c USING (user_id) JOIN p USING (user_id)
         ORDER BY user_id""",
    "e8_interval_join_outer" ->
      s"""WITH err AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS ets_us
                       FROM events WHERE event_type = 'error'),
              clk AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts_us
                      FROM events WHERE event_type = 'click')
          SELECT err.error_id, clk.click_id, err.ets_us - clk.cts_us AS lag_us
          FROM err LEFT JOIN clk
            ON err.user_id = clk.user_id
           AND clk.cts_us BETWEEN err.ets_us - $LAG_US AND err.ets_us
          ORDER BY error_id, click_id""",
    "e1_tumbling_hourly" ->
      s"""SELECT (epoch_us(ts) // ${HOUR_NS / 1000}) AS hour_bucket, event_type,
                 count(*) AS n, ${Num.sqlSum("value")} AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""",
    "e5_sliding_hourly" ->
      s"""WITH x AS (
            SELECT event_type, value,
                   unnest([epoch_us(ts) // ${HOUR_NS / 2000},
                           epoch_us(ts) // ${HOUR_NS / 2000} - 1]) AS slide_idx
            FROM events)
          SELECT slide_idx, event_type, count(*) AS n,
                 ${Num.sqlSum("value")} AS sum_value
          FROM x GROUP BY slide_idx, event_type
          ORDER BY slide_idx, event_type""",
    "e12_resample_interp" ->
      s"""WITH pts AS (
            SELECT user_id, epoch_us(ts) AS ets, max_by(value, event_id) AS v
            FROM events GROUP BY 1, 2),
          b AS (SELECT user_id, min(ets) AS tmin, max(ets) AS tmax
                FROM pts GROUP BY 1),
          g AS (SELECT user_id,
                       unnest(generate_series(tmin // ${HOUR_NS / 1000},
                                              tmax // ${HOUR_NS / 1000}))
                         * ${HOUR_NS / 1000} AS t_grid
                FROM b),
          bk AS (SELECT g.user_id, g.t_grid, p.v AS v_prev, p.ets AS t_prev
                 FROM g ASOF LEFT JOIN pts p
                   ON g.user_id = p.user_id AND g.t_grid >= p.ets),
          fw AS (SELECT bk.*, p.v AS v_next, p.ets AS t_next
                 FROM bk ASOF LEFT JOIN pts p
                   ON bk.user_id = p.user_id AND bk.t_grid <= p.ets)
          SELECT user_id, t_grid,
                 CASE WHEN t_prev = t_next THEN v_prev
                      WHEN t_prev IS NOT NULL AND t_next IS NOT NULL THEN
                        v_prev + (v_next - v_prev) *
                          ((t_grid - t_prev) / (t_next - t_prev))
                 END AS value_interp
          FROM fw ORDER BY user_id, t_grid""",
    "e11_resample_ffill" ->
      s"""WITH pts AS (
            SELECT user_id, epoch_us(ts) AS ets, max_by(value, event_id) AS v
            FROM events GROUP BY 1, 2),
          b AS (SELECT user_id, min(ets) AS tmin, max(ets) AS tmax
                FROM pts GROUP BY 1),
          g AS (SELECT user_id,
                       unnest(generate_series(tmin // ${HOUR_NS / 1000},
                                              tmax // ${HOUR_NS / 1000}))
                         * ${HOUR_NS / 1000} AS t_grid
                FROM b)
          SELECT g.user_id, g.t_grid, p.v AS value_ffill
          FROM g ASOF LEFT JOIN pts p
            ON g.user_id = p.user_id AND g.t_grid >= p.ets
          ORDER BY g.user_id, g.t_grid""",
    "e10_session_window" ->
      s"""WITH x AS (
            SELECT user_id, ts, event_id, epoch_us(ts) AS ets,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= ${GAP_NS / 1000} THEN 1
                        WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                        ELSE 0 END AS new_sess
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          y AS (
            SELECT user_id, ets,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_no
            FROM x)
          SELECT user_id, min(ets) AS start_us,
                 max(ets) + ${GAP_NS / 1000} AS end_us, count(*) AS n_events
          FROM y GROUP BY user_id, session_no ORDER BY user_id, start_us""",
    "e9_session_islands" ->
      s"""WITH x AS (
            SELECT user_id, ts, event_id, epoch_us(ts) AS ets,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GAP_NS / 1000} THEN 1
                        WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                        ELSE 0 END AS new_sess
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          y AS (
            SELECT user_id, ets,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
            FROM x)
          SELECT user_id, session_no, min(ets) AS start_us, max(ets) AS end_us,
                 count(*) AS n_events
          FROM y GROUP BY 1, 2 ORDER BY user_id, session_no""",
    "e2_sessionize" ->
      s"""WITH x AS (
            SELECT user_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GAP_NS / 1000} THEN 1
                        WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                        ELSE 0 END AS new_sess
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                 count(*) AS n_events
          FROM x GROUP BY user_id ORDER BY user_id""",
    "e3_dedup_keep_earliest" ->
      """SELECT user_id, event_type, epoch_us(first_ts) AS first_ts_us FROM (
           SELECT user_id, event_type, ts AS first_ts,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id, event_type""",
    "e4_out_of_order_frac" ->
      """WITH x AS (
           SELECT event_type,
                  CASE WHEN epoch_us(ts) < max(epoch_us(ts))
                         OVER (PARTITION BY event_type ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       THEN 1 ELSE 0 END AS late
           FROM events)
         SELECT event_type, CAST(sum(late) AS BIGINT) AS n_late, count(*) AS n
         FROM x GROUP BY event_type ORDER BY event_type""",
    "pa1_markov_transitions" ->
      """WITH s AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ets,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id) AS nxt
          FROM events),
          c AS (SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS n
                FROM s WHERE nxt IS NOT NULL GROUP BY cur, nxt),
          t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM c GROUP BY cur)
          SELECT c.cur, c.nxt, c.n,
                 CAST(c.n AS DOUBLE) / CAST(t.n_cur AS DOUBLE) AS p
          FROM c JOIN t USING (cur)
          ORDER BY c.cur, c.nxt""",
    "pa2_top_paths" ->
      """WITH s AS (SELECT event_type AS t1,
                 lead(event_type, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
          c AS (SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
                FROM s WHERE t3 IS NOT NULL GROUP BY t1, t2, t3)
          SELECT t1, t2, t3, n FROM c
          ORDER BY n DESC, t1, t2, t3 LIMIT 20""",

    "e19_decayed_engagement" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                            CAST(round(value * 100) AS BIGINT) AS cents
                     FROM events),
          mx AS (SELECT max(day) AS maxd FROM ev),
          sc AS (SELECT user_id, cents,
                        1000000 // (CAST(1 AS BIGINT)
                          << least((maxd - day) // 7, 20)) AS factor
                 FROM ev, mx),
          ag AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                        CAST(sum(cents) AS BIGINT) AS raw_cents,
                        CAST(sum(cents * factor) AS BIGINT) AS decayed_score
                 FROM sc GROUP BY user_id)
          SELECT user_id, n_events, raw_cents, decayed_score
          FROM ag ORDER BY decayed_score DESC, user_id LIMIT 20""",
  )
}
