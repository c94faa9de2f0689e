package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Array-math Expressions for the per-row scoring paths (r6 optimization).
  * Each replaces a Catalyst higher-order-function chain that ran
  * CodegenFallback-interpreted per ELEMENT; accumulation and comparison
  * orders mirror the HOF chains exactly, so results are bit-identical
  * (pinned in ArrayMathParitySpec):
  *
  *  - [[ArrayMath.softmax_arr]] ≡ the [[TopK.softmaxArrHof]] chain
  *    (`e = transform(x, exp(x − array_max(x)))`, `s = aggregate(e, 0.0,
  *    +)` left fold, `transform(e, _ / s)`), also covering q_x8_softmax's
  *    inline spelling (its p0 is element 1 of this array — the numerator
  *    `exp(x0 − m)` and denominator are the same IEEE ops in the same
  *    order).
  *  - [[ArrayMath.neg_indexed_sorted]] ≡ `array_sort(transform(probs,
  *    (p, i) => struct((p * -1.0) as negp, i as idx)))` — the candidate
  *    frame of [[TopK.topKClassColumns]]. Doubles compare with Spark's
  *    SQL ordering (`a == b` first, so -0.0 ties +0.0 and the idx field
  *    breaks it — java.util.Arrays.sort on boxed comparators would
  *    order -0.0 < 0.0 and diverge).
  *  - [[ArrayMath.sort_by_xxhash]] ≡ `transform(array_sort(transform(
  *    toks, w => struct(xxhash64(w) as h, w as tok))), _.tok)` — the
  *    hash-order prefix-filter ordering of
  *    [[graft.dedup.Dedup.jaccardPrefixJoin]]. Hashes via the same
  *    XXH64 kernel (seed 42) Spark's `xxhash64` uses on strings; ties
  *    break by UTF8String binary compare, exactly the StringType struct
  *    field ordering.
  */
object ArrayMath {

  def softmax_arr(arr: Column): Column =
    ColumnShim.column(SoftmaxArrExpr(ColumnShim.expr(arr)))

  def neg_indexed_sorted(probs: Column): Column =
    ColumnShim.column(NegIndexedSortExpr(ColumnShim.expr(probs)))

  def sort_by_xxhash(toks: Column): Column =
    ColumnShim.column(SortByXxHash64Expr(ColumnShim.expr(toks)))

  // ---- static helpers (called from generated code) ------------------------

  /** Spark SQL double ordering: `==` first (-0.0 ties +0.0), then
    * `java.lang.Double.compare` (total NaN order) — the comparator struct
    * field sorting uses.
    */
  @inline private def cmpDouble(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  def softmaxArr(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) { anyNull = arr.isNullAt(i); i += 1 }
    if (anyNull) {
      // HOF semantics: a null element nulls the aggregate sum, so EVERY
      // output element of `transform(e, _ / s)` is null
      return new GenericArrayData(out) // all nulls
    }
    if (n == 0) return new GenericArrayData(out)
    var m = arr.getDouble(0)
    i = 1
    while (i < n) { val v = arr.getDouble(i); if (v > m) m = v; i += 1 }
    val e = new Array[Double](n)
    var s = 0.0
    i = 0
    while (i < n) {
      e(i) = math.exp(arr.getDouble(i) - m)
      s += e(i) // left fold from 0.0, as aggregate(e, 0.0, +)
      i += 1
    }
    i = 0
    while (i < n) { out(i) = e(i) / s; i += 1 }
    new GenericArrayData(out)
  }

  def negIndexedSorted(probs: ArrayData): ArrayData = {
    val n = probs.numElements()
    // (negp boxed-or-null, idx) pairs in index order, then Spark-ordered
    val negp = new Array[Any](n)
    var i = 0
    while (i < n) {
      negp(i) =
        if (probs.isNullAt(i)) null
        else java.lang.Double.valueOf(probs.getDouble(i) * -1.0)
      i += 1
    }
    val idx = Array.tabulate(n)(identity)
    // Spark struct ordering, ascending: null field first, then cmpDouble,
    // then the (unique) idx — insertion sort is fine for the ≤ dozens of
    // classes this is used on, and ordering is total so stability is moot
    val boxed = idx.map(java.lang.Integer.valueOf)
    java.util.Arrays.sort(boxed, (x: Integer, y: Integer) => {
      val (a, b) = (negp(x), negp(y))
      val c =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else cmpDouble(a.asInstanceOf[java.lang.Double].doubleValue(),
          b.asInstanceOf[java.lang.Double].doubleValue())
      if (c != 0) c else Integer.compare(x, y)
    })
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val j = boxed(i).intValue()
      out(i) = InternalRow(negp(j), j)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val XxSeed = 42L // spark.sql.functions.xxhash64's fixed seed

  /** xxhash64(token) exactly as Spark computes it for a StringType input. */
  def xx64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, XxSeed)

  def sortByXxHash(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val ts = new Array[UTF8String](n)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      // xxhash64(null) leaves the seed untouched; null tokens sort by the
      // (null) string with nulls first on the tie — unreachable for the
      // array_distinct(split(...)) inputs this is used on, but total
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      hs(i) = if (ts(i) == null) XxSeed else xx64(ts(i))
      i += 1
    }
    val idx = Array.tabulate(n)(java.lang.Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) => {
      val c = java.lang.Long.compare(hs(x), hs(y))
      if (c != 0) c
      else {
        val (a, b) = (ts(x), ts(y))
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else a.compareTo(b)
      }
    })
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = ts(idx(i).intValue()); i += 1 }
    new GenericArrayData(out)
  }
}

case class SoftmaxArrExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"softmax_arr requires array<double>, got ${t.catalogString}" +
        " — cast explicitly")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullSafeEval(v: Any): Any =
    ArrayMath.softmaxArr(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayMath.softmaxArr($c)")
  override protected def withNewChildInternal(c: Expression): SoftmaxArrExpr =
    copy(c)
  override def prettyName: String = "softmax_arr"
}

case class NegIndexedSortExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"neg_indexed_sorted requires array<double>, got ${t.catalogString}" +
        " — cast explicitly")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("negp", DoubleType, nullable = true),
    StructField("idx", IntegerType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ArrayMath.negIndexedSorted(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ArrayMath.negIndexedSorted($c)")
  override protected def withNewChildInternal(c: Expression): NegIndexedSortExpr =
    copy(c)
  override def prettyName: String = "neg_indexed_sorted"
}

case class SortByXxHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sort_by_xxhash requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = child.dataType // same tokens, reordered
  override def nullSafeEval(v: Any): Any =
    ArrayMath.sortByXxHash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayMath.sortByXxHash($c)")
  override protected def withNewChildInternal(c: Expression): SortByXxHash64Expr =
    copy(c)
  override def prettyName: String = "sort_by_xxhash"
}
