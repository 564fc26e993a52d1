package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeReference, AttributeSet,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator tier (c) of the build brief's
  * custom-operator ladder: a custom [[LogicalPlan]] node, planned by a
  * [[SparkStrategy]] into a custom [[SparkPlan]] that declares its
  * distribution + ordering REQUIREMENTS and lets EnsureRequirements place
  * the exchanges and sorts.
  *
  * Semantics (backward as-of, DuckDB `ASOF JOIN ... ON l.t >= r.t`): for
  * each left row, the latest right row with rightTime <= leftTime within
  * the same key; carry columns are null when no such row exists. NULL
  * right times never match; a NULL left time matches nothing. NULL keys
  * group together (the [[graft.ops.AsOfJoin]] window-form convention; the
  * corpus exercises non-null keys, where this equals DuckDB's).
  *
  * Why a physical operator when the union+window form
  * ([[graft.ops.AsOfJoin.asofJoin]]) already streams: the window form pays
  * (1) a union that widens both sides to the merged schema before the
  * shuffle — every left row carries null slots for the right payload and
  * vice versa — and (2) a WindowExec whose running `last()` buffers and
  * re-emits ALL union rows, left AND right, then filters half of them back
  * out. The native operator shuffles each side at its own width and
  * streams ONE forward merge pass per partition (right rows are consumed
  * exactly once, held as a single carried row — O(1) state per key like
  * the window form, but no union blow-up, no post-filter, and the planner
  * sees a real join node with its own partitioning contract:
  * outputPartitioning = left's, so downstream per-key ops reuse the
  * exchange).
  */
case class AsOfJoinNode(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    carry: Seq[Attribute], carryOut: Seq[Attribute],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key on both sides")
  require(carry.size == carryOut.size && carry.nonEmpty,
    "as-of join needs at least one carry column")
  override def output: Seq[Attribute] = left.output ++ carryOut
  // carryOut attrs are MINTED here (fresh exprIds over the carry values) —
  // declare them produced or the analyzer flags them as missing inputs
  override def producedAttributes: AttributeSet = AttributeSet(carryOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lt, rt, carry, out, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, carry, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children hash-clustered on the keys and sorted
  * by (keys, time) — both declared as requirements, so the planner plans
  * the two exchanges + two sorts (and can elide them when a child is
  * already partitioned/sorted right, e.g. off a bucketed table — the
  * thing the union form can never express).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    carry: Seq[Attribute], carryOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carryOut
  override def producedAttributes: AttributeSet = AttributeSet(carryOut)

  // the operator neither re-keys nor reorders the left side: expose its
  // partitioning (and sort order) so a downstream groupBy/window on the
  // same key plans ZERO additional exchanges
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val nKeys = keyTypes.size
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (keys..., time) projections feed ONE lexicographic comparator:
      // rKT <= lKT  ⇔  rkey < lkey, or same key with rtime <= ltime —
      // exactly "this right row is usable now or already stale"
      val lKT = UnsafeProjection.create(leftKeys :+ leftTime, left.output)
      val rKT = UnsafeProjection.create(rightKeys :+ rightTime, right.output)
      val carryProj = UnsafeProjection.create(carry, right.output)
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes :+ timeType)
      // keyOrd compares only positions 0..nKeys-1, so it doubles as the
      // key-prefix comparator over the SAME (keys, time) rows — no
      // separate key projections or copies per row
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullCarry = new GenericInternalRow(carry.size)
      val outProj = UnsafeProjection.create(output, left.output ++ carryOut)
      val joined = new JoinedRow

      // single forward cursor over the right side; NULL-time rows skipped
      // at the cursor (never matchable). Projection buffers are reused per
      // row, so the cursor keeps COPIES of the (key,time) row.
      var rRow: InternalRow = null
      var rkt: InternalRow = null
      def advanceRight(): Unit = {
        rRow = null; rkt = null
        while (rRow == null && rIter.hasNext) {
          val r = rIter.next()
          val kt = rKT(r)
          if (!kt.isNullAt(nKeys)) { rRow = r; rkt = kt.copy() }
        }
      }
      advanceRight()

      // held = the latest right row consumed so far: its carry payload
      // (copied out of the reused projection buffer) plus its (keys, time)
      // row — the cursor's own copy, whose key PREFIX is compared against
      // the left (keys, time) row to decide match validity
      var heldCarry: InternalRow = null
      var heldKT: InternalRow = null

      lIter.map { l =>
        val lkt = lKT(l)
        while (rkt != null && ktOrd.compare(rkt, lkt) <= 0) {
          heldCarry = carryProj(rRow).copy()
          heldKT = rkt
          advanceRight()
        }
        val matched = !lkt.isNullAt(nKeys) && heldKT != null &&
          keyOrd.compare(heldKT, lkt) == 0
        outProj(joined(l, if (matched) heldCarry else nullCarry))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-facing constructor for [[AsOfJoinNode]]. */
object NativeAsOf {

  /** Native as-of join (backward): `carry` = (outputName, rightColumn)
    * pairs. Same contract as [[graft.ops.AsOfJoin.asofJoin]] — right side
    * unique per (key, rightTime), carry names must not collide with left
    * columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               carry: Seq[(String, String)]): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.ensureStrategy(spark, AsOfJoinStrategy)
    val lp = GraftSqlBridge.analyzed(left)
    val rp0 = GraftSqlBridge.analyzed(right)
    // self-join hygiene: when both sides derive from the same scan they
    // share attribute exprIds, and a node whose left/right keys carry the
    // SAME id confuses column pruning (the analyzer's DeduplicateRelations
    // normally rewrites the right side — we build past analysis, so do the
    // equivalent: re-alias the right output to fresh ids)
    val rp = if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val clash = carry.map(_._1).toSet.intersect(lp.output.map(_.name).toSet)
    require(clash.isEmpty,
      s"asofJoin carry names collide with left columns: ${clash.mkString(", ")}")
    val carryIn = carry.map { case (_, rc) => attr(rp, rc) }
    val carryOut = carry.zip(carryIn).map { case ((n, _), a) =>
      AttributeReference(n, a.dataType, nullable = true)()
    }
    GraftSqlBridge.ofRows(spark, AsOfJoinNode(
      key.map(attr(lp, _)), key.map(attr(rp, _)),
      attr(lp, leftTimeCol), attr(rp, rightTimeCol),
      carryIn, carryOut, lp, rp))
  }

  /** Forward variant (earliest right with rightTime >= leftTime): the
    * backward exec on negated times — max(−t_r) under −t_r ≤ −t_l ⇔
    * min(t_r) under t_r ≥ t_l. Numeric time columns only, same as the
    * composed [[graft.ops.AsOfJoin.asofJoinForward]].
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: Seq[String],
                      leftTimeCol: String, rightTimeCol: String,
                      carry: Seq[(String, String)]): DataFrame = {
    require(!left.columns.contains("__negt") && !right.columns.contains("__negt"),
      "asofJoinForward: '__negt' is reserved")
    import org.apache.spark.sql.functions.col
    asofJoin(
      left.withColumn("__negt", -col(leftTimeCol)),
      right.withColumn("__negt", -col(rightTimeCol)),
      key, "__negt", "__negt", carry).drop("__negt")
  }

  /** Bounded-staleness variant through the native exec: matches older than
    * `tolerance` (leftTime − rightTime > tolerance) yield NULL carries —
    * pandas `merge_asof(tolerance=...)` semantics. Pure post-projection on
    * [[asofJoin]] (the latest match is the only in-window candidate), so
    * the merge pass, exchange placement, and outputPartitioning contract
    * are unchanged.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: Seq[String],
                        leftTimeCol: String, rightTimeCol: String,
                        tolerance: org.apache.spark.sql.Column,
                        carry: Seq[(String, String)]): DataFrame = {
    require(!carry.map(_._1).contains("__rt"), "asofJoinTolerance: '__rt' is reserved")
    import org.apache.spark.sql.functions.{col, when}
    val out = asofJoin(left, right, key, leftTimeCol, rightTimeCol,
      carry :+ ("__rt" -> rightTimeCol))
    carry.foldLeft(out) { case (df, (n, _)) =>
      df.withColumn(n, when(col(leftTimeCol) - col("__rt") <= tolerance, col(n)))
    }.drop("__rt")
  }
}
