package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Num

/** SURVEY §2.3 joins. The catlas join surface is: one cartesian fan-out
  * against a tiny dimension (J1/J2), equi-joins for validation data (J3/J4),
  * zip-as-columns (J5, a non-join here by design), and the memo-cache
  * anti-join (J6). Every small side is explicitly `broadcast()` — at 100 TB
  * the big side never shuffles for these; the only shuffled join in this
  * pack is none (all dims fit in a broadcast).
  */
object JoinQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 cross join vs tiny dim = broadcast nested loop, never a shuffle
    // cartesian (prediction_steps.py:271: surfaces × ≤82 adsorbates).
    "j1_cross_join_broadcast" -> ((s, d) =>
      Tables.nation(s, d)
        .crossJoin(broadcast(Tables.region(s, d)))
        .select("n_nationkey", "n_name", "r_regionkey", "r_name")
        .orderBy("n_nationkey", "r_regionkey")),

    // J2 merged projection after the cross join (dict-union semantics of
    // enumerate_slabs_adslabs.py:180-187): child carries both sides' columns.
    "j2_merge_combo" -> ((s, d) =>
      Tables.nation(s, d).crossJoin(broadcast(Tables.region(s, d)))
        .select(col("n_name"), col("r_name"),
          concat_ws("/", col("r_name"), col("n_name")).as("combo_id"))
        .orderBy("combo_id")),

    // J3 inner equi-join ML⋈DFT (process_trajectories_for_validation.py:62)
    // + downstream aggregate; customer dim broadcast.
    "j3_equi_join_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Num.dsum(col("o_totalprice")).as("total_price"))
        .orderBy("c_mktsegment")),

    // J4 composite-key lookup join (parity npz lookup by
    // (distribution, id), data_processing_utils.py:23-41) — left join on a
    // two-column key, nulls preserved for misses.
    "j4_composite_key_left_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val pt = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
      li.join(broadcast(pt),
          li("l_partkey") === pt("p_partkey") && (li("l_linenumber") % 2 === pt("p_size") % 2),
          "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("p_name"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J5 zip-join: Dask splits metadata/atoms/graphs into parallel bags and
    // re-zips them positionally (prediction_steps.py:304-342); in Spark they
    // are columns of ONE DataFrame — here an equi-join stitches the two
    // corpus tables once and all downstream work is column-local.
    "j5_zip_as_columns" -> ((s, d) =>
      Tables.embeddings(s, d)
        .join(Tables.documents(s, d), col("vec_id") === col("doc_id"), "inner")
        .select(col("vec_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"),
          array_min(col("embedding")).cast("double").as("min_e"))
        .orderBy("vec_id")),

    // J6 memo-cache probe (cache_utils.py:168-216 → SURVEY §4.3): misses =
    // left ANTI join against the memo table.
    "j6_anti_join_memo" -> ((s, d) => {
      val memo = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      Tables.lineitem(s, d)
        .join(broadcast(memo), col("l_orderkey") === col("o_orderkey"), "left_anti")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A7's left-semi reading (SURVEY §2.3): groups where a qualifying row
    // EXISTS, as a semi join.
    "j7_semi_join_exists" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("k"))
      Tables.customer(s, d)
        .join(broadcast(big), col("c_custkey") === col("k"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Skew-safe SHUFFLED join via explicit salting ([[graft.ops.SaltedJoin]]):
    // lineitem (big side, salted) ⋈ orders-projection (replicated per salt)
    // on the order key — the plan AQE can't fix when the join sits in an
    // iterative loop or the build side exceeds broadcast. Semantics are
    // exactly the plain join (oracle below IS the plain join).
    "j8_salted_join" -> ((s, d) => {
      val small = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ops.SaltedJoin.inner(Tables.lineitem(s, d), small,
          Seq("l_orderkey"), salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          Num.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // SCD2 dimension merge (the lakehouse MERGE/upsert shape): an incoming
    // update snapshot closes the current version of each changed key and
    // opens version 2; unchanged keys pass through. Updates are derived
    // deterministically from the dim itself (custkey % 7 = 0 gets +100
    // acctbal) so the oracle can reproduce them. Plan: the update set is
    // small relative to the dim → BROADCAST semi/anti joins, the 100 TB dim
    // never shuffles; three branches (closed, unchanged, new) union
    // narrowly. A real MERGE INTO in Delta/Iceberg compiles to exactly
    // this join+union — here it is the explicit declarative form.
    "cdc1_scd2_merge" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
      val upd = dim.filter(col("c_custkey") % 7 === 0)
        // c_acctbal is DOUBLE; +100.0 is one IEEE add, bit-identical in
        // DuckDB — no decimal detour needed for exactness here
        .select(col("c_custkey"),
          (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
      val updKeys = upd.select("c_custkey")
      val closed = dim.join(broadcast(updKeys), Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_acctbal"),
          lit(1).as("version"), lit(false).as("is_current"))
      val unchanged = dim.join(broadcast(updKeys), Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"),
          lit(1).as("version"), lit(true).as("is_current"))
      val opened = upd
        .select(col("c_custkey"), col("c_acctbal"),
          lit(2).as("version"), lit(true).as("is_current"))
      closed.unionByName(unchanged).unionByName(opened)
        .orderBy("c_custkey", "version")
    }),

    // Snapshot diff — the CDC companion to cdc1: given two versions of a
    // table, emit only the delta rows (added / removed / changed). Both
    // snapshots derive deterministically from the dim itself (old = keys
    // % 11 ≠ 1, new = keys % 13 ≠ 2 with % 5 = 0 balances bumped +50) so
    // the oracle reproduces them. Plan: ONE keyed full-outer join — both
    // sides are table-scale at 100 TB so nothing broadcasts, and the
    // added/removed/changed classification is a row-local CASE after the
    // join (unchanged rows drop without any second pass). +50.0 is one
    // IEEE add — bit-identical cross-engine, cdc1's discipline.
    "cdc2_snapshot_diff" -> ((s, d) => {
      val dim = Tables.customer(s, d).select("c_custkey", "c_acctbal")
      val old_ = dim.filter(col("c_custkey") % 11 =!= 1)
        .select(col("c_custkey"), col("c_acctbal").as("old_bal"))
      val neu = dim.filter(col("c_custkey") % 13 =!= 2)
        .select(col("c_custkey"),
          when(col("c_custkey") % 5 === 0, col("c_acctbal") + lit(50.0))
            .otherwise(col("c_acctbal")).as("new_bal"))
      old_.join(neu, Seq("c_custkey"), "full_outer")
        .withColumn("status",
          when(col("old_bal").isNull, "added")
            .when(col("new_bal").isNull, "removed")
            .when(col("old_bal") =!= col("new_bal"), "changed"))
        .filter(col("status").isNotNull)
        .orderBy("c_custkey")
    }),

    // Retractable-aggregate maintenance — the CDC DELETE path cdc1/cdc2
    // leave open: a maintained per-customer rollup absorbs a retraction
    // batch as NEGATED partials merged in one keyed aggregate, never by
    // rescanning the base (count and decimal-sum are abelian groups, so
    // merge(base, −deltas) ≡ recompute — which is exactly what the
    // DuckDB oracle computes, making the gate an equivalence proof).
    // Customers whose last order is retracted leave the rollup (n = 0
    // drops). At 100 TB the base partials are the persisted snapshot;
    // only the delta batch is scanned fresh — the d15 anti-join
    // discipline applied to aggregation state.
    "cdc3_retractable_agg" -> ((s, d) => {
      val orders = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      def part(df: DataFrame, sgn: Int) = df.groupBy("o_custkey")
        .agg((count(lit(1)) * sgn).as("n"),
          (sum(col("cents")) * sgn).as("c"))
      val base = part(orders, 1) // stands in for the persisted snapshot
      val retract = part(orders.filter(col("o_orderkey") % 17 === 0), -1)
      base.unionByName(retract)
        .groupBy("o_custkey")
        .agg(sum(col("n")).as("n_orders"), sum(col("c")).as("total_cents"))
        .filter(col("n_orders") > 0)
        .orderBy("o_custkey")
    }),

    // Two-sided delta-JOIN maintenance — the incremental-view-maintenance
    // identity cdc3 leaves open (cdc3 maintains an aggregate; this
    // maintains a JOIN view): for insert-only deltas on both sides,
    // Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB, so the refreshed
    // view is the old view plus three delta branches — and the DuckDB
    // oracle recomputes the full join from scratch, making the gate an
    // incremental ≡ full equivalence proof. Splits are deterministic key
    // residues so both engines reproduce them. Scale shape: at 100 TB the
    // A_old ⋈ B_old branch is the PERSISTED view (never recomputed — here
    // it stands in, cdc3's convention); the three live branches touch only
    // delta-scale inputs (ΔA is a day's orders, ΔB a day's dim changes),
    // and each branch pre-aggregates to domain-bounded (segment) partials
    // before the final merge — the shuffles carry partials, not rows.
    "cdc4_delta_join" -> ((s, d) => {
      val ords = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val aOld = ords.filter(col("o_orderkey") % 10 =!= 7)
      val dA = ords.filter(col("o_orderkey") % 10 === 7)
      val bOld = cust.filter(col("c_custkey") % 9 =!= 4)
      val dB = cust.filter(col("c_custkey") % 9 === 4)
      def branch(o: DataFrame, c: DataFrame): DataFrame =
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      branch(aOld, bOld) // stands in for the persisted view partials
        .unionByName(branch(dA, bOld))
        .unionByName(branch(aOld, dB))
        .unionByName(branch(dA, dB))
        .groupBy("seg")
        .agg(sum(col("n")).as("n_orders"), sum(col("c")).as("total_cents"))
        .orderBy("seg")
    }),

    // SCD2 temporal join — the "which dimension version was current when
    // the fact happened" operator every warehouse event pipeline runs:
    // each event picks up the attribute of its user's dim version whose
    // [valid_from, valid_to) interval covers the event day. The versioned
    // dim derives deterministically from the observed user set (two
    // versions per user, the tier changing at a per-user breakpoint day)
    // so the oracle rebuilds it exactly. Plan: the version table is
    // dim-scale → BROADCAST range join; the fact scan never shuffles (the
    // rj1 binning path is the fallback when the dim outgrows broadcast).
    // Exactly one version matches per event by construction, so the join
    // is inner and row-preserving.
    "cdc5_temporal_join" -> ((s, d) => {
      val DayNs = 24L * 3600 * 1000 * 1000 * 1000
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr(s"ts DIV $DayNs").as("day"))
      val users = ev.select("user_id").distinct()
      // breakpoint: day 19728 + (user % 20); v1 tier = user % 3 before
      // it, v2 tier = (user + 1) % 3 from it on (sentinel horizon 1e9)
      val vers = users.select(col("user_id").as("vu"),
          (lit(19728L) + col("user_id") % 20).as("mid"))
        .select(col("vu"), explode(array(
          struct(lit(0L).as("valid_from"), col("mid").as("valid_to"),
            (col("vu") % 3).as("tier"), lit(1).as("version")),
          struct(col("mid").as("valid_from"),
            lit(1000000000L).as("valid_to"),
            ((col("vu") + 1) % 3).as("tier"), lit(2).as("version"))))
          .as("v"))
        .select(col("vu"), col("v.valid_from"), col("v.valid_to"),
          col("v.tier"), col("v.version"))
      ev.join(broadcast(vers),
          col("user_id") === col("vu") &&
            col("day") >= col("valid_from") && col("day") < col("valid_to"))
        .select(col("event_id"), col("user_id"), col("day"),
          col("tier"), col("version"))
        .orderBy("event_id")
    }),

    // Referential-integrity audit — the warehouse-health operator: for
    // each FK relationship, how many child rows point at a missing parent
    // (orphans) and how many parents are never referenced. Orphans are a
    // keyed LEFT ANTI join riding the child's partitioning; unreferenced
    // parents anti-join against the DISTINCT child keys (pre-aggregated so
    // the anti-join probe is parent-scale, not fact-scale). The three
    // 1-row audit results join by broadcast — bounded by the number of
    // relationships, never by data.
    "dq3_referential_integrity" -> ((s, d) => {
      def rel(name: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String): DataFrame = {
        val orphans = child
          .join(parent.select(col(pk).as(ck)), Seq(ck), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        val unref = parent
          .join(child.select(col(ck).as(pk)).distinct(), Seq(pk), "left_anti")
          .agg(count(lit(1)).as("n_unreferenced"))
        child.agg(count(lit(1)).as("n_child_rows"))
          .join(broadcast(orphans)).join(broadcast(unref)) // 1-row sides
          .select(lit(name).as("relationship"), col("n_child_rows"),
            col("n_orphans"), col("n_unreferenced"))
      }
      rel("lineitem.partkey->part",
          Tables.lineitem(s, d).select("l_partkey"), "l_partkey",
          Tables.part(s, d), "p_partkey")
        .unionByName(rel("lineitem.suppkey->supplier",
          Tables.lineitem(s, d).select("l_suppkey"), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"))
        .unionByName(rel("orders.custkey->customer",
          Tables.orders(s, d).select("o_custkey"), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .orderBy("relationship")
    }),

    // Column-profile drift between cdc2's two snapshot versions — the
    // schema-health companion to the row-level diff: per column, null
    // count and distinct count in each version plus the null-rate drift
    // in ppm (v2 nulls out mktsegment for custkey % 7 = 3, so the drift
    // readout provably fires on exactly one column). Shape: the profile
    // is declared as one shared aggregate referenced per column; Catalyst
    // prunes each long-form branch to a SINGLE-COLUMN aggregate — on
    // columnar parquet each branch therefore reads exactly its own column
    // once (the per-column union of one-column scans IS the efficient
    // plan; a fused all-columns pass would read the same bytes). The
    // pivot and the v1⋈v2 join run broadcast on O(columns) rows.
    "dq4_profile_drift" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      val v1 = dim.filter(col("c_custkey") % 11 =!= 1)
      val v2 = dim.filter(col("c_custkey") % 13 =!= 2)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") + lit(50.0))
            .otherwise(col("c_acctbal")))
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 7 === 3, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")))
      val cols = Seq("c_nationkey", "c_acctbal", "c_mktsegment")
      def profile(df: DataFrame): DataFrame = {
        val aggs = count(lit(1)).as("n_rows") +:
          cols.flatMap(c => Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c")))
        val a = df.agg(aggs.head, aggs.tail: _*)
        cols.map(c => a.select(lit(c).as("col_name"), col("n_rows"),
            col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct")))
          .reduce(_ unionByName _)
      }
      profile(v1)
        .select(col("col_name"), col("n_rows").as("v1_rows"),
          col("n_nulls").as("v1_nulls"), col("n_distinct").as("v1_distinct"))
        .join(profile(v2).select(col("col_name"),
          col("n_rows").as("v2_rows"), col("n_nulls").as("v2_nulls"),
          col("n_distinct").as("v2_distinct")), Seq("col_name"))
        .withColumn("v1_null_ppm", expr("(1000000 * v1_nulls) div v1_rows"))
        .withColumn("v2_null_ppm", expr("(1000000 * v2_nulls) div v2_rows"))
        .withColumn("null_drift_ppm", col("v2_null_ppm") - col("v1_null_ppm"))
        .orderBy("col_name")
    }),

    // TPC-H Q3 shape (shipping priority): the classic fact⋈fact⋈dim
    // multi-join — lineitem⋈orders shuffles on the orderkey, the filtered
    // customer dim broadcasts, and all three filters reach their scans
    // (PushedFilters). Revenue = per-row double product (4 clean decimal
    // digits — unambiguous) folded through the decimal discipline.
    "q3_shipping_priority" -> ((s, d) => {
      val cut = lit("1998-03-15").cast("timestamp")
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          // o_orderdate reads as TIMESTAMP_NTZ; cast for unix_micros —
          // equal to DuckDB's epoch_us(naive ts) under the UTC session
          unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("odate_us"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape (local supplier volume): six tables, one shuffled
    // fact⋈fact join (lineitem⋈orders), every dim chain broadcast —
    // region→nation prunes suppliers, and the c_nationkey = s_nationkey
    // "local" constraint rides the supplier join. The optimizer's join
    // ordering + broadcast selection exercised end-to-end.
    "q5_local_supplier_volume" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val asia = Tables.nation(s, d).join(
          broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q17 shape (small-quantity revenue): the correlated scalar
    // subquery "quantity < 0.2 × this part's average" decorrelated by
    // hand the way Spark's optimizer would — the brand/size part filter
    // broadcasts and prunes lineitem BEFORE any shuffle, the per-part
    // average aggregates only the pruned rows (one keyed shuffle), and
    // the tiny avg table broadcasts back onto the same pruned stream.
    // avg stays exact cross-engine: quantities are integral doubles, so
    // every partial sum is exact regardless of partitioning.
    "q17_small_quantity_revenue" -> ((s, d) => {
      val pf = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#23" && col("p_size") <= 15)
        .select("p_partkey")
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .drop("p_partkey")
      val av = li.groupBy("l_partkey")
        .agg((avg(col("l_quantity")) * lit(0.2)).as("lim"))
      li.join(broadcast(av), Seq("l_partkey"))
        .filter(col("l_quantity") < col("lim"))
        .agg(count(lit(1)).as("n_small"),
          (Num.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    }),

    // TPC-H Q18 shape (large-volume customers): HAVING-subquery turned
    // inside out — lineitem aggregates per order (the one wide shuffle),
    // the post-HAVING survivor set is tiny and BROADCASTS into orders,
    // and that result (still tiny) broadcasts into customer, so neither
    // dim ever shuffles. Quantity totals are integral → exact as BIGINT.
    "q18_large_volume_customers" -> ((s, d) => {
      val hot = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
        .filter(col("total_qty") > 300)
      val withOrd = Tables.orders(s, d)
        .join(broadcast(hot), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"),
          col("o_totalprice"), col("total_qty"))
      Tables.customer(s, d).select("c_custkey", "c_name")
        .join(broadcast(withOrd), col("c_custkey") === col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "odate_us",
          "o_totalprice", "total_qty")
        .orderBy(col("o_totalprice").desc, col("odate_us"), col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q21 shape (sole problem supplier): the classic
    // EXISTS(other supplier) + NOT EXISTS(other problem supplier) pair,
    // decorrelated into ONE pass — lineitem aggregates per
    // (orderkey, suppkey) with a has-problem flag (the one wide shuffle),
    // and both correlated subqueries become window counts over the SAME
    // orderkey partitioning, so they add zero exchanges. The corpus has no
    // commit/receipt dates; "problem line" = l_returnflag = 'R'. Spelled
    // naively this is 3 scans of lineitem and 2 extra shuffled joins.
    "q21_sole_problem_supplier" -> ((s, d) => {
      // one explicit orderkey-only shuffle: hashpartitioning(orderkey)
      // satisfies the (orderkey, suppkey) aggregate's ClusteredDistribution
      // (subset key) AND the window's partitionBy(orderkey), so neither
      // adds an exchange — groupBy alone would partition on both keys and
      // force a second shuffle for the window
      val perSupp = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
          .as("has_prob"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      val sole = perSupp
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_prob", sum(col("has_prob")).over(w))
        .filter(col("has_prob") === 1 && col("n_supp") > 1 && col("n_prob") === 1)
      sole.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q22 shape (global sales opportunity): the scalar AVG subquery
    // is a 1-row aggregate broadcast onto the dim scan, and NOT EXISTS
    // (recent orders) is a shuffled LEFT ANTI on o_custkey — the fact side
    // never broadcasts (its distinct-key set is O(|customers|)); AQE picks
    // the build side at runtime. "Idle" = no order since 2000-01-01 (this
    // corpus gives every customer SOME order across 1995-2001, so the
    // unfiltered NOT EXISTS would be vacuous; the date filter also reaches
    // the orders scan as a PushedFilter). Decimal-exact acctbal avg.
    "q22_idle_rich_customers" -> ((s, d) => {
      val segs = Seq("BUILDING", "MACHINERY", "FURNITURE")
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment").isin(segs: _*))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(Num.davg(col("c_acctbal")).as("avg_bal"))
      cust.join(broadcast(avgBal)) // 1-row scalar: broadcast nested loop
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"), Num.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey,
                 ${Num.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
                 epoch_us(o_orderdate) AS odate_us, o_orderpriority
          FROM customer, orders, lineitem
          WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
            AND l_orderkey = o_orderkey
            AND o_orderdate < TIMESTAMP '1998-03-15'
            AND l_shipdate > TIMESTAMP '1998-03-15'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, odate_us, l_orderkey LIMIT 10""",
    "q5_local_supplier_volume" ->
      s"""SELECT n_name,
                 ${Num.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
          FROM customer, orders, lineitem, supplier, nation, region
          WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
            AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q17_small_quantity_revenue" ->
      s"""WITH pf AS (SELECT p_partkey FROM part
                      WHERE p_brand = 'Brand#23' AND p_size <= 15),
          li AS (SELECT l_partkey, l_quantity, l_extendedprice
                 FROM lineitem JOIN pf ON l_partkey = p_partkey),
          av AS (SELECT l_partkey, avg(l_quantity) * 0.2 AS lim
                 FROM li GROUP BY l_partkey)
          SELECT CAST(count(*) AS BIGINT) AS n_small,
                 ${Num.sqlSum("l_extendedprice")} / 7.0 AS avg_yearly
          FROM li JOIN av USING (l_partkey) WHERE l_quantity < lim""",
    "q18_large_volume_customers" ->
      """WITH hot AS (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
                      FROM lineitem GROUP BY l_orderkey
                      HAVING sum(l_quantity) > 300)
          SELECT c_name, c_custkey, o_orderkey, epoch_us(o_orderdate) AS odate_us,
                 o_totalprice, total_qty
          FROM customer, orders, hot
          WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
          ORDER BY o_totalprice DESC, odate_us, o_orderkey LIMIT 100""",
    "j8_salted_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
                 ${Num.sqlSum("l_extendedprice")} AS sum_price
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "cdc1_scd2_merge" ->
      """SELECT c_custkey, c_acctbal, CAST(1 AS INT) AS version,
                (c_custkey % 7 <> 0) AS is_current
         FROM customer
         UNION ALL
         SELECT c_custkey, c_acctbal + 100.0, CAST(2 AS INT), true
         FROM customer WHERE c_custkey % 7 = 0
         ORDER BY c_custkey, version""",
    "cdc2_snapshot_diff" ->
      """WITH a AS (SELECT c_custkey, c_acctbal AS old_bal
                    FROM customer WHERE c_custkey % 11 <> 1),
          b AS (SELECT c_custkey,
                       CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 50.0
                            ELSE c_acctbal END AS new_bal
                FROM customer WHERE c_custkey % 13 <> 2)
         SELECT c_custkey, old_bal, new_bal,
                CASE WHEN old_bal IS NULL THEN 'added'
                     WHEN new_bal IS NULL THEN 'removed'
                     WHEN old_bal <> new_bal THEN 'changed' END AS status
         FROM a FULL OUTER JOIN b USING (c_custkey)
         WHERE old_bal IS NULL OR new_bal IS NULL OR old_bal <> new_bal
         ORDER BY c_custkey""",
    // the equivalence proof: the oracle RECOMPUTES from scratch what the
    // query maintains incrementally via negated partials
    "cdc3_retractable_agg" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS total_cents
         FROM orders WHERE o_orderkey % 17 <> 0
         GROUP BY o_custkey ORDER BY o_custkey""",
    // full-join recompute: hash-matching the three-branch union proves
    // the delta identity exact
    "cdc4_delta_join" ->
      """SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS total_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY seg""",
    "cdc5_temporal_join" ->
      """WITH ev AS (SELECT event_id, user_id,
                            epoch_us(ts) // 86400000000 AS day
                     FROM events),
          users AS (SELECT DISTINCT user_id FROM ev),
          vers AS (
            SELECT user_id AS vu, 0 AS valid_from,
                   19728 + user_id % 20 AS valid_to,
                   user_id % 3 AS tier, 1 AS version FROM users
            UNION ALL
            SELECT user_id, 19728 + user_id % 20, 1000000000,
                   (user_id + 1) % 3, 2 FROM users)
          SELECT event_id, user_id, day,
                 CAST(tier AS BIGINT) AS tier, CAST(version AS INT) AS version
          FROM ev JOIN vers ON user_id = vu
            AND day >= valid_from AND day < valid_to
          ORDER BY event_id""",
    "dq3_referential_integrity" ->
      """SELECT 'lineitem.partkey->part' AS relationship,
                CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child_rows,
                CAST((SELECT count(*) FROM lineitem
                      WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
                     AS BIGINT) AS n_orphans,
                CAST((SELECT count(*) FROM part
                      WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem))
                     AS BIGINT) AS n_unreferenced
         UNION ALL
         SELECT 'lineitem.suppkey->supplier',
                CAST((SELECT count(*) FROM lineitem) AS BIGINT),
                CAST((SELECT count(*) FROM lineitem
                      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
                     AS BIGINT),
                CAST((SELECT count(*) FROM supplier
                      WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem))
                     AS BIGINT)
         UNION ALL
         SELECT 'orders.custkey->customer',
                CAST((SELECT count(*) FROM orders) AS BIGINT),
                CAST((SELECT count(*) FROM orders
                      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
                     AS BIGINT),
                CAST((SELECT count(*) FROM customer
                      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
                     AS BIGINT)
         ORDER BY relationship""",
    "dq4_profile_drift" -> profileDriftSql,
    "j1_cross_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
         FROM nation CROSS JOIN region ORDER BY n_nationkey, r_regionkey""",
    "j2_merge_combo" ->
      """SELECT n_name, r_name, concat_ws('/', r_name, n_name) AS combo_id
         FROM nation CROSS JOIN region ORDER BY combo_id""",
    "j3_equi_join_agg" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
                 ${Num.sqlSum("o_totalprice")} AS total_price
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "j4_composite_key_left_join" ->
      """SELECT l_orderkey, l_linenumber, p_name
         FROM lineitem LEFT JOIN part
           ON l_partkey = p_partkey AND l_linenumber % 2 = p_size % 2
         ORDER BY l_orderkey, l_linenumber""",
    "j5_zip_as_columns" ->
      """SELECT vec_id, lang, len(string_split(text, ' ')) AS n_tokens,
                CAST(list_min(embedding) AS DOUBLE) AS min_e
         FROM embeddings JOIN documents ON vec_id = doc_id ORDER BY vec_id""",
    "j6_anti_join_memo" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_orderstatus = 'F' AND o_orderkey = l_orderkey)
         ORDER BY l_orderkey, l_linenumber""",
    "j7_semi_join_exists" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""",
    // Oracle deliberately keeps the textbook correlated-subquery spelling:
    // hash-matching it proves the one-pass window decorrelation is exact.
    "q21_sole_problem_supplier" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier,
              (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
               WHERE l_returnflag = 'R') l1
         WHERE s_suppkey = l1.l_suppkey
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "q22_idle_rich_customers" ->
      s"""WITH cust AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
                        WHERE c_mktsegment IN ('BUILDING','MACHINERY','FURNITURE')),
          av AS (SELECT ${Num.sqlAvg("c_acctbal")} AS avg_bal
                 FROM cust WHERE c_acctbal > 0.0)
          SELECT c_mktsegment, count(*) AS numcust,
                 ${Num.sqlSum("c_acctbal")} AS totacctbal
          FROM cust, av
          WHERE c_acctbal > avg_bal
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '2000-01-01')
          GROUP BY c_mktsegment ORDER BY c_mktsegment""",
  )

  /** dq4: cdc2's version CTEs, one all-columns aggregate per version,
    * long-form via UNION ALL over the same column list the Spark side
    * iterates ('//' floor division mirrors `div`).
    */
  private def profileDriftSql: String = {
    val cols = Seq("c_nationkey", "c_acctbal", "c_mktsegment")
    val aggSel = cols.map(c =>
      s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c,
                 CAST(count(DISTINCT $c) AS BIGINT) AS nd_$c""").mkString(",\n                 ")
    def longForm(p: String) = cols.map(c =>
      s"SELECT '$c' AS col_name, n_rows, nn_$c AS n_nulls, nd_$c AS n_distinct FROM $p")
      .mkString("\n               UNION ALL ")
    s"""WITH v1 AS (SELECT c_nationkey, c_acctbal, c_mktsegment
                    FROM customer WHERE c_custkey % 11 <> 1),
          v2 AS (SELECT c_nationkey,
                        CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 50.0
                             ELSE c_acctbal END AS c_acctbal,
                        CASE WHEN c_custkey % 7 = 3 THEN NULL
                             ELSE c_mktsegment END AS c_mktsegment
                 FROM customer WHERE c_custkey % 13 <> 2),
          p1 AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 $aggSel FROM v1),
          p2 AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 $aggSel FROM v2),
          l1 AS (${longForm("p1")}),
          l2 AS (${longForm("p2")})
          SELECT l1.col_name,
                 l1.n_rows AS v1_rows, l1.n_nulls AS v1_nulls,
                 l1.n_distinct AS v1_distinct,
                 l2.n_rows AS v2_rows, l2.n_nulls AS v2_nulls,
                 l2.n_distinct AS v2_distinct,
                 CAST((1000000 * l1.n_nulls) // l1.n_rows AS BIGINT)
                   AS v1_null_ppm,
                 CAST((1000000 * l2.n_nulls) // l2.n_rows AS BIGINT)
                   AS v2_null_ppm,
                 CAST((1000000 * l2.n_nulls) // l2.n_rows
                      - (1000000 * l1.n_nulls) // l1.n_rows AS BIGINT)
                   AS null_drift_ppm
          FROM l1 JOIN l2 USING (col_name)
          ORDER BY col_name"""
  }
}
