package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{AsOfJoin, Num, SaltedAgg}

/** As-of join + skew-salted aggregation over the corpus, oracle-checked
  * against DuckDB's NATIVE `ASOF JOIN` — our composed union-scan operator
  * must reproduce the dedicated engine primitive exactly.
  */
object AsOfQueries extends QueryPack {

  // ao6 staleness bound: 36 h in µs — the corpus's error→click gap has
  // median ≈34 h at sf0.01, so the bound nulls roughly half the matches
  // (980 in-window / 929 nulled-stale / 105 never-matched): both CASE
  // branches of the oracle fire on a large slice, nothing is vacuous
  private val TOL_US = 36L * 3600 * 1000 * 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For each 'error' event: the user's most recent 'click' at or before
    // it (µs time, right side deduped per (user, t) by max id).
    "ao1_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("ts DIV 1000").as("cts"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.asofJoin(errors, clicks, Seq("user_id"),
          col("ets"), col("cts"), Seq("click_id" -> col("click_id")))
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    }),

    // Forward variant: the user's NEXT click at or after each error.
    "ao3_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("ts DIV 1000").as("cts"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.asofJoinForward(errors, clicks, Seq("user_id"),
          col("ets"), col("cts"), Seq("click_id" -> col("click_id")))
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    }),

    // ao1's semantics through the NATIVE physical operator (custom
    // LogicalPlan + Strategy + AsOfJoinExec): each side shuffles once at
    // its own width, one forward merge pass per partition — no union
    // widening, no WindowExec buffering, no post-filter. Hash-matching
    // ao1's oracle proves the custom SparkPlan bit-reproduces both the
    // composed form and DuckDB's dedicated primitive.
    "ao4_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("ts DIV 1000").as("cts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.plans.NativeAsOf.asofJoin(errors, clicks, Seq("user_id"),
          "ets", "cts", Seq("click_id" -> "click_id"))
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    }),

    // Forward variant through the native exec (negated-time reduction).
    "ao5_asof_forward_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("ts DIV 1000").as("cts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.plans.NativeAsOf.asofJoinForward(errors, clicks, Seq("user_id"),
          "ets", "cts", Seq("click_id" -> "click_id"))
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    }),

    // Bounded-staleness as-of through the native exec: a click more than
    // TOL_US µs before the error yields NULL (pandas merge_asof
    // `tolerance` semantics). Post-projection on the unbounded native
    // operator — the latest match is the only in-window candidate — so
    // the plan (one exchange per side, one merge pass) is unchanged.
    // NEAREST-direction as-of — the sensor-alignment variant (match the
    // closest reading in EITHER direction, ties to the past): composed
    // from the backward and forward one-shuffle kernels, each also
    // carrying its matched timestamp, then one error-scale keyed join
    // picks the nearer side row-locally. All distances are integer
    // micros. At 100 TB this is two partitioned window passes over the
    // union scan + one keyed join of two error-scale frames — no new
    // machinery, which is the point of building asof as a kernel.
    "ao7_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("ts DIV 1000").as("cts"))
        .agg(max(col("event_id")).as("click_id"))
      val b = AsOfJoin.asofJoin(errors, clicks, Seq("user_id"),
        col("ets"), col("cts"),
        Seq("b_id" -> col("click_id"), "b_ts" -> col("cts")))
      val f = AsOfJoin.asofJoinForward(errors, clicks, Seq("user_id"),
          col("ets"), col("cts"),
          Seq("f_id" -> col("click_id"), "f_ts" -> col("cts")))
        .select(col("event_id"), col("f_id"), col("f_ts"))
      b.join(f, Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          when(col("f_ts").isNull, col("b_id"))
            .when(col("b_ts").isNull, col("f_id"))
            .when(col("ets") - col("b_ts") <= col("f_ts") - col("ets"),
              col("b_id"))
            .otherwise(col("f_id")).as("click_id"),
          when(col("f_ts").isNull, col("ets") - col("b_ts"))
            .when(col("b_ts").isNull, col("f_ts") - col("ets"))
            .otherwise(least(col("ets") - col("b_ts"),
              col("f_ts") - col("ets"))).as("dist_us"))
        .orderBy("event_id")
    }),

    "ao6_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ets"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("ts DIV 1000").as("cts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.plans.NativeAsOf.asofJoinTolerance(errors, clicks, Seq("user_id"),
          "ets", "cts", lit(TOL_US), Seq("click_id" -> "click_id"))
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    }),

    // Last-touch attribution: the marketing-analytics shape built ON the
    // native as-of operator — each purchase matches the user's most recent
    // click (or none → organic), then revenue rolls up per (day,
    // attributed). The as-of side shuffles once per side; the rollup is an
    // ordinary partial+final aggregate on the joined stream.
    "at1_last_touch_revenue" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"),
          expr("ts DIV 1000").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("ts DIV 1000").as("cts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.plans.NativeAsOf.asofJoin(purch, clicks, Seq("user_id"),
          "pts", "cts", Seq("click_id" -> "click_id"))
        .select(expr("pts DIV 86400000000").as("day_idx"),
          col("click_id").isNotNull.as("attributed"), col("value"))
        .groupBy("day_idx", "attributed")
        .agg(count(lit(1)).as("n_purchases"), Num.dsum(col("value")).as("revenue"))
        .orderBy("day_idx", "attributed")
    }),

    // Linear (multi-touch) attribution — at1's complement: last-touch
    // hands each purchase to ONE click; here the purchase value splits
    // EQUALLY across every click in the 24 h lookback, credited to the
    // day the TOUCH happened (the spend-planning view), with no-touch
    // purchases rolled up as organic. Shape: the purchase×click pair
    // generation is a user-keyed equi-join with the window as a
    // post-filter — per-user pairs are bounded by activity, never
    // all-pairs — the per-purchase touch count comes from a keyed
    // aggregate joined back on pid (window-free), and each credit
    // value/n is a single cross-engine-identical double divide summed
    // under the Num decimal pin.
    "at2_linear_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("value"),
          expr("ts DIV 1000").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts DIV 1000").as("cts"))
      val pairs = purch.join(clicks, Seq("user_id"))
        .filter(col("cts") <= col("pts") &&
          col("cts") > col("pts") - lit(86400000000L))
      val nTouch = pairs.groupBy("pid").agg(count(lit(1)).as("n"))
      val credited = pairs.join(nTouch, "pid")
        .select(expr("cts DIV 86400000000").as("day_idx"),
          (col("value") / col("n").cast("double")).as("credit"))
        .groupBy("day_idx")
        .agg(count(lit(1)).as("n"), Num.dsum(col("credit")).as("revenue"))
        .select(col("day_idx"), lit("touch").as("kind"), col("n"),
          col("revenue"))
      val organic = purch
        .join(pairs.select("pid").distinct(), Seq("pid"), "left_anti")
        .select(expr("pts DIV 86400000000").as("day_idx"), col("value"))
        .groupBy("day_idx")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("revenue"))
        .select(col("day_idx"), lit("organic").as("kind"), col("n"),
          col("revenue"))
      credited.unionAll(organic).orderBy("day_idx", "kind")
    }),

    // Salted two-phase aggregate == plain aggregate (exactness): revenue
    // per returnflag through 8 salt buckets (decimal partials, so the
    // two-phase merge is order-independent).
    "ao2_salted_agg" -> ((s, d) =>
      SaltedAgg.saltedSum(Tables.lineitem(s, d), Seq("l_returnflag"),
        col("l_quantity").cast("decimal(30,6)"), "sum_qty", salts = 8)
        .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"))
        .orderBy("l_returnflag")),
  )

  val oracles: Map[String, String] = Map(
    "ao1_asof_join" ->
      """WITH clicks AS (
           SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         err AS (
           SELECT event_id, user_id, epoch_us(ts) AS ets
           FROM events WHERE event_type = 'error')
         SELECT e.event_id, e.user_id, c.click_id
         FROM err e ASOF LEFT JOIN clicks c
           ON e.user_id = c.user_id AND e.ets >= c.cts
         ORDER BY e.event_id""",
    "ao4_asof_native" ->
      """WITH clicks AS (
           SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         err AS (
           SELECT event_id, user_id, epoch_us(ts) AS ets
           FROM events WHERE event_type = 'error')
         SELECT e.event_id, e.user_id, c.click_id
         FROM err e ASOF LEFT JOIN clicks c
           ON e.user_id = c.user_id AND e.ets >= c.cts
         ORDER BY e.event_id""",
    // two native ASOF probes (>= backward, <= forward), nearer side picked
    // row-locally, ties to the past — mirrors the composed Spark kernel
    "ao7_asof_nearest" ->
      """WITH clicks AS (
           SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         err AS (
           SELECT event_id, user_id, epoch_us(ts) AS ets
           FROM events WHERE event_type = 'error'),
         b AS (
           SELECT e.event_id, e.user_id, e.ets, c.click_id AS b_id,
                  c.cts AS b_ts
           FROM err e ASOF LEFT JOIN clicks c
             ON e.user_id = c.user_id AND e.ets >= c.cts),
         f AS (
           SELECT e.event_id, c.click_id AS f_id, c.cts AS f_ts
           FROM err e ASOF LEFT JOIN clicks c
             ON e.user_id = c.user_id AND e.ets <= c.cts)
         SELECT b.event_id, b.user_id,
                CASE WHEN f_ts IS NULL THEN b_id
                     WHEN b_ts IS NULL THEN f_id
                     WHEN ets - b_ts <= f_ts - ets THEN b_id
                     ELSE f_id END AS click_id,
                CASE WHEN f_ts IS NULL THEN ets - b_ts
                     WHEN b_ts IS NULL THEN f_ts - ets
                     ELSE least(ets - b_ts, f_ts - ets) END AS dist_us
         FROM b JOIN f ON b.event_id = f.event_id
         ORDER BY b.event_id""",

    "ao6_asof_tolerance" ->
      s"""WITH clicks AS (
           SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         err AS (
           SELECT event_id, user_id, epoch_us(ts) AS ets
           FROM events WHERE event_type = 'error')
         SELECT e.event_id, e.user_id,
                CASE WHEN e.ets - c.cts <= ${TOL_US} THEN c.click_id END AS click_id
         FROM err e ASOF LEFT JOIN clicks c
           ON e.user_id = c.user_id AND e.ets >= c.cts
         ORDER BY e.event_id""",
    "ao5_asof_forward_native" ->
      """WITH clicks AS (
           SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         err AS (
           SELECT event_id, user_id, epoch_us(ts) AS ets
           FROM events WHERE event_type = 'error')
         SELECT e.event_id, e.user_id, c.click_id
         FROM err e ASOF LEFT JOIN clicks c
           ON e.user_id = c.user_id AND e.ets <= c.cts
         ORDER BY e.event_id""",
    "ao3_asof_forward" ->
      """WITH clicks AS (
           SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         err AS (
           SELECT event_id, user_id, epoch_us(ts) AS ets
           FROM events WHERE event_type = 'error')
         SELECT e.event_id, e.user_id, c.click_id
         FROM err e ASOF LEFT JOIN clicks c
           ON e.user_id = c.user_id AND e.ets <= c.cts
         ORDER BY e.event_id""",
    "at1_last_touch_revenue" ->
      s"""WITH clicks AS (
           SELECT user_id, epoch_us(ts) AS cts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         purch AS (
           SELECT user_id, event_id, value, epoch_us(ts) AS pts
           FROM events WHERE event_type = 'purchase')
         SELECT p.pts // 86400000000 AS day_idx,
                c.click_id IS NOT NULL AS attributed,
                count(*) AS n_purchases,
                ${Num.sqlSum("p.value")} AS revenue
         FROM purch p ASOF LEFT JOIN clicks c
           ON p.user_id = c.user_id AND p.pts >= c.cts
         GROUP BY 1, 2 ORDER BY day_idx, attributed""",
    "ao2_salted_agg" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "at2_linear_attribution" ->
      s"""WITH purch AS (
            SELECT user_id, event_id AS pid, value, epoch_us(ts) AS pts
            FROM events WHERE event_type = 'purchase'),
          clicks AS (
            SELECT user_id, epoch_us(ts) AS cts
            FROM events WHERE event_type = 'click'),
          pairs AS (
            SELECT p.pid, p.value, c.cts
            FROM purch p JOIN clicks c
              ON c.user_id = p.user_id AND c.cts <= p.pts
                 AND c.cts > p.pts - 86400000000),
          nt AS (SELECT pid, CAST(count(*) AS BIGINT) AS n
                 FROM pairs GROUP BY pid),
          credited AS (
            SELECT cts // 86400000000 AS day_idx, 'touch' AS kind,
                   CAST(count(*) AS BIGINT) AS n,
                   ${Num.sqlSum("value / CAST(nt.n AS DOUBLE)")} AS revenue
            FROM pairs JOIN nt USING (pid) GROUP BY 1, 2),
          organic AS (
            SELECT pts // 86400000000 AS day_idx, 'organic' AS kind,
                   CAST(count(*) AS BIGINT) AS n,
                   ${Num.sqlSum("value")} AS revenue
            FROM purch WHERE pid NOT IN (SELECT pid FROM pairs)
            GROUP BY 1, 2)
          SELECT * FROM credited
          UNION ALL SELECT * FROM organic
          ORDER BY day_idx, kind""",
  )
}
