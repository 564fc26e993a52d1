package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sorted smallest-k buffer backing [[SmallestKLongsAgg]]: an ascending
  * `long[]` prefix, grown lazily (most groups are far below the cap — the
  * co-purchase degree distribution is heavy-tailed, so eagerly allocating
  * `long[k]` per group would spend k·8 bytes on every leaf center the
  * aggregation map holds). Insert is binary-search + arraycopy with an
  * O(1) reject once full (the common case on hubs); duplicates are kept,
  * matching [[TopKAggregator.SmallestLongs]] exactly — gt5 feeds distinct
  * neighbor ids, and the parity spec pins the two implementations equal.
  */
final class LongTopK(val k: Int) {
  private var a = new Array[Long](math.min(k, 8))
  private var nn = 0

  def n: Int = nn
  /** Ascending copy of the kept values (size n). */
  def values: Array[Long] = java.util.Arrays.copyOf(a, nn)

  def insert(v: Long): Unit = {
    if (nn == k && v >= a(k - 1)) return // full and too large: O(1) reject
    var lo = 0
    var hi = nn
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < v) lo = mid + 1 else hi = mid
    }
    if (nn < k && nn == a.length)
      a = java.util.Arrays.copyOf(a, math.min(k, a.length * 2))
    val keep = math.min(nn, k - 1) // surviving entries after the insert
    System.arraycopy(a, lo, a, lo + 1, keep - lo)
    a(lo) = v
    if (nn < k) nn += 1
  }

  def mergeFrom(o: LongTopK): Unit = {
    val ov = o.values
    var i = 0
    // ascending insert order: once one value rejects O(1), the rest do too
    while (i < ov.length) {
      if (nn == k && ov(i) >= a(k - 1)) return
      insert(ov(i))
      i += 1
    }
  }
}

/** Native smallest-k-longs grouped aggregate — the round-11 rewrite of
  * [[TopKAggregator.SmallestLongs]] (gt5's per-center neighborhood cap)
  * from a typed Dataset `Aggregator` to a Catalyst
  * [[TypedImperativeAggregate]].
  *
  * Same semantics and the same O(k) per-group state bound, but none of
  * the typed path's per-row costs: the `groupByKey.mapValues.agg`
  * spelling pays a DeserializeToObject boundary (whole-stage codegen
  * breaks), an `ExpressionEncoder[List[Long]]` round-trip of the buffer
  * at every partial-aggregate output row, and a boxed cons-list rebuild
  * (`span` + `:::`) per input value. Here update is
  * `child.eval → long → binary-insert into a primitive array`, merge is
  * an arraycopy-driven fold, and the buffer only serializes where Spark
  * genuinely ships it (partial→final exchange, spill) as 4+8n bytes.
  * Measured on gt5's sf1 capped-neighborhood stage (see PLANS.md r11):
  * the aggregate stage drops from ~18.5 s to single digits, same rows.
  *
  * Runs under ObjectHashAggregateExec (hash partial aggregation with the
  * standard sort-based fallback past the configured key threshold —
  * [[graft.Sessions]] raises it from the 128 default; both paths still
  * map-side combine to ≤k values per (group, partition) before the
  * exchange, which is the 100-TB invariant that matters).
  */
case class SmallestKLongsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongTopK] {

  require(k > 0, s"smallest-k aggregate needs k > 0, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_smallest_k requires BIGINT input, got ${other.sql}")
    }

  override def createAggregationBuffer(): LongTopK = new LongTopK(k)

  override def update(buf: LongTopK, input: InternalRow): LongTopK = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongTopK, b2: LongTopK): LongTopK = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: LongTopK): Any = new GenericArrayData(buf.values)

  override def serialize(buf: LongTopK): Array[Byte] = {
    val vs = buf.values
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    var i = 0
    while (i < vs.length) { bb.putLong(vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongTopK = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new LongTopK(k)
    var i = 0
    // ascending on the wire (values() is sorted) → every insert appends
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SmallestKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SmallestKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SmallestKLongsAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_smallest_k"
}

object SmallestKLongsAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge._

  /** `smallestK(col, k)` as an aggregate Column for `groupBy(...).agg`. */
  def smallestK(c: Column, k: Int): Column =
    column(SmallestKLongsAgg(expression(c), k).toAggregateExpression())
}
