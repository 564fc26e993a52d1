package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hot kernels the built-in
  * higher-order functions evaluate interpreted (lambda + boxing per
  * element):
  *
  *  - [[PolyHashExpr]]: the 31-ary rolling hash. Semantically identical to
  *    `aggregate(split(s,''), 0L, (a,c) -> (a*31+ascii(c)) % P)` for ASCII
  *    input (UTF-16 code unit = codepoint there), but a tight codegen loop:
  *    ~20× over the interpreted fold on the dedup benchmarks.
  *  - [[SeqDotExpr]]: sequential left-fold dot product of two float arrays
  *    in double — identical result order to
  *    `aggregate(zip_with(a,b,(x,y)->x*y), 0.0, (s,v)->s+v)`, so cosine
  *    scores stay bit-equal to the DuckDB oracle while running inside
  *    codegen.
  *
  * Preference order per the build brief: compose built-ins where they're
  * fast; drop to a custom `Expression` with `doGenCode` exactly where the
  * built-ins can't express the semantics *efficiently*.
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // analysis-time type error beats a runtime ClassCastException
  // (AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4)
  override def checkInputDataTypes(): TypeCheckResult =
    // pattern match, not object equality: Spark 4 collated strings are
    // StringType instances with nonzero collationId and evaluate fine here
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash requires STRING input, got ${other.sql}")
    }

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % StableHash.P; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      String ${ev.value}_s = $c.toString();
      long ${ev.value}_h = 0L;
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_s.length(); ${ev.value}_i++) {
        ${ev.value}_h = (${ev.value}_h * 31 + ${ev.value}_s.charAt(${ev.value}_i))
          % ${StableHash.P}L;
      }
      ${ev.value} = ${ev.value}_h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** Wide fingerprint tier of [[PolyHashExpr]]: the two independent folds
  * (mod P, mod P2) of [[graft.functions.StableHash.polyHash64]] in ONE
  * char loop with two accumulators, paired as `h1·2^31 + h2` (< 2^61).
  * Collisions require a simultaneous root mod P·P2 ≈ 2^60 — the property
  * span dedup's semantic quality rests on (a colliding gram is MARKED
  * DUPLICATE; see Dedup.dupSpans).
  */
case class PolyHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash64 requires STRING input, got ${other.sql}")
    }

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < s.length) {
      h1 = (h1 * 31 + s.charAt(i)) % StableHash.P
      h2 = (h2 * 31 + s.charAt(i)) % StableHash.P2
      i += 1
    }
    h1 * 2147483648L + h2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      String ${ev.value}_s = $c.toString();
      long ${ev.value}_h1 = 0L;
      long ${ev.value}_h2 = 0L;
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_s.length(); ${ev.value}_i++) {
        char ${ev.value}_c = ${ev.value}_s.charAt(${ev.value}_i);
        ${ev.value}_h1 = (${ev.value}_h1 * 31 + ${ev.value}_c) % ${StableHash.P}L;
        ${ev.value}_h2 = (${ev.value}_h2 * 31 + ${ev.value}_c) % ${StableHash.P2}L;
      }
      ${ev.value} = ${ev.value}_h1 * 2147483648L + ${ev.value}_h2;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash64Expr =
    copy(child = newChild)
}

case class SeqDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // per-side FLOAT or DOUBLE arrays (element accessor is dispatched on the
  // STATIC type): ArrayData.getFloat on a double array would read garbage,
  // so any other element type must fail analysis, not corrupt scores
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_seq_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDouble(left), isDouble(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += (if (xd) x.getDouble(i) else x.getFloat(i).toDouble) *
        (if (yd) y.getDouble(i) else y.getFloat(i).toDouble)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(v: String, dbl: Boolean, i: String) =
        if (dbl) s"$v.getDouble($i)" else s"((double) $v.getFloat($i))"
      s"""
      int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
      double ${ev.value}_acc = 0.0;
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        ${ev.value}_acc += ${get(a, isDouble(left), s"${ev.value}_i")}
          * ${get(b, isDouble(right), s"${ev.value}_i")};
      }
      ${ev.value} = ${ev.value}_acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SeqDotExpr =
    copy(left = l, right = r)
}

/** Sequential squared-L2 over the element range [off, off+n) of two
  * FLOAT|DOUBLE arrays — the subspace-distance kernel behind PQ encoding
  * ([[graft.ops.Similarity.pqTopK]]). Identical fold order to the unrolled
  * `Σ (a[i]−b[i])²` left fold from 0.0 (each element cast to double before
  * subtraction), so the DuckDB `list_reduce` twin stays bit-equal — but
  * one tight codegen loop instead of an n-term expression tree (the same
  * janino-compile-latency trade [[SeqDotExpr]] documents).
  */
case class SeqL2Expr(left: Expression, right: Expression, off: Int, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_seq_l2 requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDouble(left), isDouble(right))
    val end = math.min(off + n, math.min(x.numElements(), y.numElements()))
    var acc = 0.0
    var i = off
    while (i < end) {
      val d = (if (xd) x.getDouble(i) else x.getFloat(i).toDouble) -
        (if (yd) y.getDouble(i) else y.getFloat(i).toDouble)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(v: String, dbl: Boolean, i: String) =
        if (dbl) s"$v.getDouble($i)" else s"((double) $v.getFloat($i))"
      s"""
      int ${ev.value}_end = java.lang.Math.min($off + $n,
        java.lang.Math.min($a.numElements(), $b.numElements()));
      double ${ev.value}_acc = 0.0;
      for (int ${ev.value}_i = $off; ${ev.value}_i < ${ev.value}_end; ${ev.value}_i++) {
        double ${ev.value}_d = ${get(a, isDouble(left), s"${ev.value}_i")}
          - ${get(b, isDouble(right), s"${ev.value}_i")};
        ${ev.value}_acc += ${ev.value}_d * ${ev.value}_d;
      }
      ${ev.value} = ${ev.value}_acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SeqL2Expr =
    copy(left = l, right = r)
}

/** Fused cosine similarity: dot, ‖a‖², ‖b‖² accumulated in ONE traversal,
  * result = dot / (√‖a‖²·√‖b‖²). Bit-identical to the composed
  * `seqDot(a,b) / (sqrt(seqDot(a,a)) * sqrt(seqDot(b,b)))` — each
  * accumulator adds in index order exactly as its standalone loop would
  * (dot over min(|a|,|b|), norms over their full arrays via tail loops) —
  * but the arrays are read once instead of three times (plus once more
  * each for the norms' duplicated children). The sim-family's scan
  * compute sits on this kernel.
  */
case class CosineExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDouble(left), isDouble(right))
    def gx(i: Int) = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
    def gy(i: Int) = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
    val (nx, ny) = (x.numElements(), y.numElements())
    val n = math.min(nx, ny)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = gx(i); val yv = gy(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    while (i < nx) { val xv = gx(i); na += xv * xv; i += 1 }
    i = n
    while (i < ny) { val yv = gy(i); nb += yv * yv; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(v: String, dbl: Boolean, i: String) =
        if (dbl) s"$v.getDouble($i)" else s"((double) $v.getFloat($i))"
      val v = ev.value
      s"""
      int ${v}_nx = $a.numElements();
      int ${v}_ny = $b.numElements();
      int ${v}_n = java.lang.Math.min(${v}_nx, ${v}_ny);
      double ${v}_dot = 0.0; double ${v}_na = 0.0; double ${v}_nb = 0.0;
      int ${v}_i = 0;
      for (; ${v}_i < ${v}_n; ${v}_i++) {
        double ${v}_x = ${get(a, isDouble(left), s"${v}_i")};
        double ${v}_y = ${get(b, isDouble(right), s"${v}_i")};
        ${v}_dot += ${v}_x * ${v}_y; ${v}_na += ${v}_x * ${v}_x;
        ${v}_nb += ${v}_y * ${v}_y;
      }
      for (; ${v}_i < ${v}_nx; ${v}_i++) {
        double ${v}_x = ${get(a, isDouble(left), s"${v}_i")};
        ${v}_na += ${v}_x * ${v}_x;
      }
      for (${v}_i = ${v}_n; ${v}_i < ${v}_ny; ${v}_i++) {
        double ${v}_y = ${get(b, isDouble(right), s"${v}_i")};
        ${v}_nb += ${v}_y * ${v}_y;
      }
      $v = ${v}_dot / (java.lang.Math.sqrt(${v}_na) * java.lang.Math.sqrt(${v}_nb));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
    copy(left = l, right = r)
}

/** All n minhash signatures in ONE pass over the shingle-hash array.
  *
  * Semantically identical to n separate
  * `array_min(transform(hs, h -> (h*aᵢ+bᵢ) % P))` columns (including the
  * NULL result for an empty array), but those traverse — and box — the
  * array n times per row; this is a single fused loop, so the whole
  * signature matrix costs one array scan. The minhash family (d3/d4/d7/d8:
  * signatures, LSH pairs, dup groups, dedup apply) sits on this kernel.
  */
case class MinHashExpr(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need ≥1 (a,b) param pair")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input → NULL (array_min parity)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires ARRAY<BIGINT> input, got ${other.sql}")
    }

  protected override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    // array_min parity: null slots are skipped, and an array with no
    // non-null element (empty or all-null) minhashes to NULL — reading a
    // null slot as getLong=0 would silently fold a spurious b%P term in
    val mins = Array.fill(as.length)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val h = hs.getLong(i)
        var j = 0
        while (j < as.length) {
          val v = (h * as(j) + bs(j)) % StableHash.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
      val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
      val m = as.length
      s"""
      int ${ev.value}_n = $c.numElements();
      long[] ${ev.value}_m = new long[$m];
      java.util.Arrays.fill(${ev.value}_m, Long.MAX_VALUE);
      boolean ${ev.value}_any = false;
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        if ($c.isNullAt(${ev.value}_i)) continue;
        ${ev.value}_any = true;
        long ${ev.value}_h = $c.getLong(${ev.value}_i);
        for (int ${ev.value}_j = 0; ${ev.value}_j < $m; ${ev.value}_j++) {
          long ${ev.value}_v = (${ev.value}_h * $aRef[${ev.value}_j]
            + $bRef[${ev.value}_j]) % ${StableHash.P}L;
          if (${ev.value}_v < ${ev.value}_m[${ev.value}_j])
            ${ev.value}_m[${ev.value}_j] = ${ev.value}_v;
        }
      }
      if (!${ev.value}_any) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_m);
      }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

/** Packed unordered pairs of a sorted BIGINT array: for every i < j emits
  * `(a(i)·2^32 + a(j))·2 + 1` — gt5's common-neighbor pair key with the
  * [[graft.ops.TopPairs]] instance tag already applied. One primitive
  * `long[n(n−1)/2]` per input row, evaluated inside whole-stage codegen and
  * fed to the BUILT-IN `explode` (which keeps its own codegen path over
  * collection generators). Replaces the
  * `flatten(transform(ns, (x,i) -> transform(slice(ns,i+2,…), …)))` chain,
  * whose interpreted higher-order lambdas built ~n²/2 boxed Longs inside
  * n fresh nested GenericArrayData per center — measured on gt5 at sf1:
  * map-stage CPU dominated by allocation/GC of those temporaries (see
  * GraphQueries' gt5 comment for the before/after).
  *
  * Caller contract (same as the SQL chain it replaces): elements are
  * non-null, strictly ascending, and in [0, 2^30) — the pack is then
  * order-preserving on (u, v) and fits a BIGINT through PB-scale corpora.
  * The contract is ENFORCED at runtime (round-11 hardening): the
  * expression is exposed generically via [[Exprs.packedPairs]], and a
  * violating caller would otherwise get silently corrupted pair keys
  * (unsorted/out-of-range ids) or a negative-size array crash
  * (n ≥ 65536 overflows n(n−1)/2 in 32-bit). The guard is one O(n)
  * preamble pass per row against the O(n²) pair work — free — and the
  * hot pair loop is untouched.
  */
case class PackedPairsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_packed_pairs requires ARRAY<BIGINT> input, got ${other.sql}")
    }

  protected override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    PackedPairsExpr.checkContract(a, n)
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val hi = a.getLong(i) * 4294967296L
      var j = i + 1
      while (j < n) {
        out(k) = (hi + a.getLong(j)) * 2 + 1
        k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      int ${ev.value}_n = $c.numElements();
      graft.functions.PackedPairsExpr.checkContract($c, ${ev.value}_n);
      long[] ${ev.value}_o = new long[${ev.value}_n * (${ev.value}_n - 1) / 2];
      int ${ev.value}_k = 0;
      for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n - 1; ${ev.value}_i++) {
        long ${ev.value}_hi = $c.getLong(${ev.value}_i) * 4294967296L;
        for (int ${ev.value}_j = ${ev.value}_i + 1; ${ev.value}_j < ${ev.value}_n;
             ${ev.value}_j++) {
          ${ev.value}_o[${ev.value}_k++] =
            (${ev.value}_hi + $c.getLong(${ev.value}_j)) * 2 + 1;
        }
      }
      ${ev.value} =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_o);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PackedPairsExpr =
    copy(child = newChild)
}

object PackedPairsExpr {
  /** Cap above which n(n−1)/2 no longer fits an `int` array size. Any
    * real caller is far below it (gt5 caps neighborhoods at 64); hitting
    * it means the caller forgot its own cap — fail loudly, per the
    * Q_CAP/MaxNbrs "cap from birth" rule.
    */
  val MaxElems = 65535

  /** Shared eval/codegen contract check: strictly ascending, in
    * [0, 2^30), and few enough elements that the pair count fits an
    * `int`. Called from generated code, so it must stay a public static
    * (Java-visible) method with primitive-friendly arguments.
    */
  def checkContract(a: ArrayData, n: Int): Unit = {
    if (n > MaxElems) throw new IllegalArgumentException(
      s"graft_packed_pairs: $n elements would generate " +
        s"${n.toLong * (n - 1) / 2} pairs (max $MaxElems elements); " +
        "cap the input list (gt5 caps neighborhoods at 64)")
    var prev = -1L
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      if (v < 0L || v >= 1073741824L) throw new IllegalArgumentException(
        s"graft_packed_pairs: element $v out of [0, 2^30) — the packed " +
          "BIGINT key would overflow or collide")
      if (v <= prev) throw new IllegalArgumentException(
        s"graft_packed_pairs: input not strictly ascending ($prev then " +
          s"$v) — packed (u, v) keys would be order-corrupted")
      prev = v
      i += 1
    }
  }
}

object Exprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge._
  def packedPairs(c: Column): Column = column(PackedPairsExpr(expression(c)))
  def polyHash(c: Column): Column = column(PolyHashExpr(expression(c)))
  def polyHash64(c: Column): Column = column(PolyHash64Expr(expression(c)))
  def minHash(c: Column, n: Int): Column = {
    val ps = StableHash.affineParams(n)
    column(MinHashExpr(expression(c), ps.map(_._1).toArray, ps.map(_._2).toArray))
  }
  def seqDot(a: Column, b: Column): Column =
    column(SeqDotExpr(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column =
    column(CosineExpr(expression(a), expression(b)))
  def seqL2(a: Column, b: Column, off: Int, n: Int): Column =
    column(SeqL2Expr(expression(a), expression(b), off, n))
}
