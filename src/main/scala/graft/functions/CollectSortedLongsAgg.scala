package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Append-only primitive long buffer backing [[CollectSortedLongsAgg]].
  * Unlike [[LongTopK]] this keeps EVERY value (the adjacency build needs
  * the full out-neighborhood, bounded by the degree orientation's
  * O(√2m) degeneracy argument, not by a fixed k), so insertion is O(1)
  * amortized append and the sort happens exactly once per group — at
  * `eval` — instead of per-element binary-insert (which would be
  * O(deg²) arraycopy on hubs).
  */
final class LongVec {
  private var a = new Array[Long](8)
  private var nn = 0

  def n: Int = nn

  def add(v: Long): Unit = {
    if (nn == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
    a(nn) = v
    nn += 1
  }

  def addAll(o: LongVec): Unit = {
    var i = 0
    while (i < o.nn) { add(o.a(i)); i += 1 }
  }

  /** Ascending copy of the collected values (size n). Sorts in place —
    * only called at the aggregate's final `eval`.
    */
  def sortedValues: Array[Long] = {
    java.util.Arrays.sort(a, 0, nn)
    java.util.Arrays.copyOf(a, nn)
  }

  /** Raw (insertion-ordered) view for serialization. */
  def raw: Array[Long] = java.util.Arrays.copyOf(a, nn)
}

/** Native `sort_array(collect_list(x))` for BIGINT columns — the
  * primitive-buffer spelling of the adjacency build in
  * [[graft.ops.Triangles.adjacency]].
  *
  * The built-in `collect_list` runs under ObjectHashAggregateExec with a
  * boxed `mutable.ArrayBuffer[Any]` buffer (one `java.lang.Long` + one
  * generic append per input row) and then pays a separate `sort_array`
  * expression pass that copies the array again. Here update appends a
  * primitive into a growable `long[]`, merge is an arraycopy, and the
  * single sort runs at final eval over the primitive array. State per
  * group is exactly the group's value count — for degree-oriented
  * adjacency that is the O(√2m) out-degree bound, the same invariant the
  * boxed spelling relied on.
  *
  * NOT a general collect replacement: it drops nulls and returns the
  * values ASCENDING (callers wanting insertion order keep
  * `collect_list`). Parity with `sort_array(collect_list(...))` is
  * pinned in CollectSortedAggSpec.
  */
case class CollectSortedLongsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVec] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_collect_sorted requires BIGINT input, got ${other.sql}")
    }

  override def createAggregationBuffer(): LongVec = new LongVec

  override def update(buf: LongVec, input: InternalRow): LongVec = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongVec, b2: LongVec): LongVec = {
    b1.addAll(b2)
    b1
  }

  override def eval(buf: LongVec): Any = new GenericArrayData(buf.sortedValues)

  override def serialize(buf: LongVec): Array[Byte] = {
    val vs = buf.raw
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    var i = 0
    while (i < vs.length) { bb.putLong(vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVec = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new LongVec
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSortedLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSortedLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectSortedLongsAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_collect_sorted"
}

object CollectSortedLongsAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge._

  /** `collectSorted(col)` ≡ `sort_array(collect_list(col))` over BIGINT,
    * as an aggregate Column for `groupBy(...).agg`.
    */
  def collectSorted(c: Column): Column =
    column(CollectSortedLongsAgg(expression(c)).toAggregateExpression())
}
