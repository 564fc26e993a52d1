package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Packed-register spelling of the hyperball propagation state (gr7):
  * one M-byte BINARY per node — byte i holds the max rho seen for
  * register i (0 = empty) — instead of one (id, reg, rho) ROW per
  * occupied register.
  *
  * Why this exists (guide §2.3 "shuffle fewer bytes" applied to rows):
  * the sparse row form made each propagation round's edge join fan out
  * |E| × |regs(dst)| rows — after round 1 a hub's register set is
  * near-saturated (~M occupied), so round 2's mid-stage stream was
  * ~M× the edge count (measured at sf0.1: tens of millions of rows,
  * 7–78 s medians under session memory pressure). Packed, the same
  * round streams exactly |E| binary values through a bytewise-max
  * aggregate whose map-side partial combine reduces each task to its
  * ≤|V| distinct node ids before the exchange.
  *
  * Register-content equivalence with the sparse spelling (groupBy
  * (id, reg) max(rho)) is elementwise max commutativity/associativity —
  * pinned in HllRegsSpec against the sparse reference on the real gate
  * corpus.
  */
object HllRegs {
  import org.apache.spark.sql.graftbridge.ColumnBridge._

  /** Fold sparse (reg, rho) pairs into one packed M-byte register value
    * per group: `initRegs(reg, rho)` ≡ the packed form of
    * `groupBy(.., reg).agg(max(rho))`.
    */
  def initRegs(reg: Column, rho: Column): Column =
    column(HllRegsInitAgg(expression(reg), expression(rho))
      .toAggregateExpression())

  /** Bytewise max over packed register values — the merge round. */
  def maxRegs(regs: Column): Column =
    column(HllRegsMaxAgg(expression(regs)).toAggregateExpression())

  /** Estimator inputs from a packed register value, packed into ONE long:
    * `(Σ_i MaxTerm >> rho_i) << 9 | used` where an empty register
    * contributes MaxTerm and `used` counts occupied registers.
    * ssum ≤ M·MaxTerm = 2^29 and used ≤ M = 2^8, so the pack fits with
    * room; unpack with shiftright(st, 9) / st & 511.
    */
  def stats(regs: Column): Column = column(HllRegsStatsExpr(expression(regs)))

  private[functions] def bytewiseMax(acc: Array[Byte], in: Array[Byte]): Unit = {
    var i = 0
    while (i < acc.length) {
      if (in(i) > acc(i)) acc(i) = in(i)
      i += 1
    }
  }
}

/** `initRegs` — see [[HllRegs]]. Buffer = the packed M-byte array itself;
  * serialize/deserialize are identity copies.
  */
case class HllRegsInitAgg(
    reg: Expression,
    rho: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = reg :: rho :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (reg.dataType, rho.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (r, h) => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_init_regs requires (BIGINT reg, INT rho), got (${r.sql}, ${h.sql})")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val r = reg.eval(input)
    val h = rho.eval(input)
    if (r != null && h != null) {
      val i = r.asInstanceOf[Long].toInt
      val v = h.asInstanceOf[Int].toByte
      if (v > buf(i)) buf(i) = v
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    HllRegs.bytewiseMax(b1, b2)
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsInitAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsInitAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegsInitAgg =
    copy(reg = newChildren(0), rho = newChildren(1))

  override def prettyName: String = "graft_hll_init_regs"
}

/** `maxRegs` — see [[HllRegs]]. */
case class HllRegsMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_max_regs requires BINARY input, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllRegs.bytewiseMax(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    HllRegs.bytewiseMax(b1, b2)
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegsMaxAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll_max_regs"
}

/** `stats` — see [[HllRegs]]. Integer-exact: `ssum` reproduces the sparse
  * readout's `sp + zeros·MaxTerm` (shiftleft(1, W+1−rho) = MaxTerm >> rho
  * for present registers, MaxTerm for empty ones), so the downstream
  * double arithmetic is fed bit-identical operands.
  */
case class HllRegsStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_stats requires BINARY input, got ${other.sql}")
    }

  protected override def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[Array[Byte]]
    var ssum = 0L
    var used = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) > 0) used += 1
      ssum += Hll.MaxTerm >> regs(i)
      i += 1
    }
    (ssum << 9) | used
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      long ${ev.value}_ssum = 0L;
      long ${ev.value}_used = 0L;
      for (int ${ev.value}_i = 0; ${ev.value}_i < $c.length; ${ev.value}_i++) {
        if ($c[${ev.value}_i] > 0) ${ev.value}_used++;
        ${ev.value}_ssum += ${Hll.MaxTerm}L >> $c[${ev.value}_i];
      }
      ${ev.value} = (${ev.value}_ssum << 9) | ${ev.value}_used;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HllRegsStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_hll_stats"
}
