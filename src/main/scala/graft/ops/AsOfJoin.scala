package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-previous) join — a whole-operator semantic Spark lacks
  * natively. Per the build brief's preference order, it is composed from
  * built-ins rather than a custom SparkPlan: tag-and-union both inputs,
  * sort within the key partition by (time, tag), and carry the most recent
  * right-side row forward with `last(..., ignoreNulls)` — ONE shuffle on
  * the key, no range-explosion, no per-row binary search.
  *
  * Compare: a naive theta-join `l.ts >= r.ts` is O(|L|·|R|) per key; the
  * union-scan is O((|L|+|R|) log) from the sort and streams at 100 TB (the
  * window frame is running, so state per key is one row of carried
  * columns). Ties (equal time): right rows sort BEFORE left rows, so an
  * exactly-simultaneous right row matches — the same convention as
  * DuckDB's ASOF JOIN (`l.t >= r.t`), which the oracle checks.
  */
object AsOfJoin {

  /** Left as-of join: for each left row, the latest right row with
    * rightTime ≤ leftTime within the same key. `carry` = (name, column)
    * right-side payloads to attach (null when no prior right row exists).
    * PRECONDITION: right is unique per (key, rightTime) — dedup it first
    * (e.g. keep the max payload), or equal-time matches are ambiguous in
    * ANY as-of implementation, DuckDB's included.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTime: Column, rightTime: Column,
               carry: Seq[(String, Column)]): DataFrame = {
    // a carry name equal to a left column would silently overwrite left
    // payload via withColumn — and one equal to an internal scratch column
    // would be extracted then dropped — fail loudly on both
    val internal = Set("__t", "__tag", "__c", "__cc")
    val clash = carry.map(_._1).toSet
      .intersect(left.columns.toSet ++ key ++ internal)
    require(clash.isEmpty,
      s"asofJoin carry names collide with left/key/internal columns: ${clash.mkString(", ")}")
    if (carry.isEmpty) return left
    val payloadCols = left.columns.filterNot(key.contains).toSeq
    // NULL right times sort FIRST under ascending (__t, __tag) and would be
    // carried into every otherwise-unmatched left row; DuckDB ASOF never
    // matches NULL times, so drop them (a NULL left time then matches
    // nothing and yields null carries, same as the oracle)
    //
    // All carries ride in ONE struct, non-null for every right row: last(
    // ignoreNulls) then selects the matched right ROW atomically, so a
    // matched row whose individual carry value is NULL yields NULL (DuckDB
    // ASOF semantics) instead of leaking an older row's value — and
    // multi-carry outputs can never mix values from different right rows.
    val tagged =
      right.filter(rightTime.isNotNull).select(
        key.map(col) ++
          Seq(rightTime.as("__t"), lit(0).as("__tag"),
            struct(carry.map { case (n, c) => c.as(n) }: _*).as("__c")): _*)
      .unionByName(
        left.select(
          key.map(col) ++ Seq(leftTime.as("__t"), lit(1).as("__tag")) ++
            payloadCols.map(col): _*),
        allowMissingColumns = true)
    // right rows sort before left rows at equal time (tag 0 < 1) → an
    // exactly-simultaneous right row matches, like DuckDB ASOF's `>=`.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("__cc", last(col("__c"), ignoreNulls = true).over(w))
    carry.foldLeft(carried.filter(col("__tag") === 1)) {
      case (df, (n, _)) => df.withColumn(n, col(s"__cc.$n"))
    }.drop("__t", "__tag", "__c", "__cc")
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * rightTime ≥ leftTime within the key — the backward machinery on
    * negated times (max(−t_r) under −t_r ≤ −t_l ⇔ min(t_r) under
    * t_r ≥ t_l), so it inherits the one-shuffle union-scan plan and the
    * simultaneous-match tie rule. Numeric time columns only.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: Seq[String],
                      leftTime: Column, rightTime: Column,
                      carry: Seq[(String, Column)]): DataFrame =
    asofJoin(left, right, key, negate(leftTime), negate(rightTime), carry)

  /** Bounded-staleness as-of join: like [[asofJoin]], but a match older
    * than `tolerance` time units (leftTime − rightTime > tolerance) yields
    * NULL carries — pandas `merge_asof(tolerance=...)` semantics. Composes
    * on the unbounded operator with zero extra shuffles: the latest right
    * row ≤ leftTime is the ONLY candidate (any in-window right row would
    * be at least as recent), so carrying the matched right time and
    * null-ing stale matches in a post-projection is exact.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: Seq[String],
                        leftTime: Column, rightTime: Column, tolerance: Column,
                        carry: Seq[(String, Column)]): DataFrame = {
    require(!carry.map(_._1).contains("__rt"), "asofJoinTolerance: '__rt' is reserved")
    val out = asofJoin(left, right, key, leftTime, rightTime,
      carry :+ ("__rt" -> rightTime))
    carry.foldLeft(out) { case (df, (n, _)) =>
      // unmatched rows have NULL __rt → the predicate is NULL → `when`
      // yields NULL, same as the unbounded form
      df.withColumn(n, when(leftTime - col("__rt") <= tolerance, col(n)))
    }.drop("__rt")
  }
}

/** Skew-aware aggregation (SURVEY §7.4 #5: post-fan-out hot keys).
  *
  * Two-phase salted aggregate: phase 1 aggregates on (key, salt) — hot keys
  * split across `salts` reducers — phase 2 merges the partials. Correct for
  * any algebraic aggregate expressed as (partial, merge) pairs. At 1000
  * executors this is the difference between one straggler reducer owning a
  * hot key and `salts`-way parallelism on it; AQE's skew handling covers
  * joins, but a skewed groupBy still needs the salt.
  */
object SaltedAgg {
  def saltedSum(df: DataFrame, key: Seq[String], valueCol: Column,
                outName: String, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(key.map(col): _*)
      .agg(sum(col("__partial")).as(outName))
  }
}

/** Skew-aware equi-join by explicit salting — for the cases AQE's runtime
  * skew split can't reach: a skewed SHUFFLED hash/SMJ join inside an
  * iterative loop (AQE replans only the first execution), or a build side
  * too big to broadcast with one pathological key. The big (skewed) side
  * gets a random salt in [0, salts); the small side is replicated once per
  * salt value (explode of a literal range — `salts`× its size, which must
  * stay ≪ the big side); the join key becomes (key, salt), so one hot key
  * fans across `salts` reducers instead of one straggler.
  */
object SaltedJoin {
  def inner(big: DataFrame, small: DataFrame, key: Seq[String],
            salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val bs = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    // sequence over int literals yields array<int> — no cast on the
    // generator (a generator nested in any expression fails analysis)
    val ss = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bs.join(ss, key :+ "__salt").drop("__salt")
  }
}
