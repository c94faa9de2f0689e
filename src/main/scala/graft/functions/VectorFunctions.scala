package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Vector primitives for the similarity/ANN path as native codegen
  * Expressions. The Column-HOF formulations (`aggregate(zip_with(...))`)
  * are CodegenFallback in Catalyst — interpreted, one array traversal per
  * plane — so the hot path uses these instead: one static call per row,
  * single pass (cosine) or one pass per plane over a cached plane matrix
  * (bucket). Accumulation ORDER mirrors the HOF versions exactly, so the
  * doubles are bit-identical (pinned by AnnSpec parity tests).
  */
object VectorFunctions {

  /** Exact cosine similarity of two array<double> columns (native). */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimExpr(ColumnShim.expr(a), ColumnShim.expr(b)))

  /** Sign-bit hyperplane bucket of an array<double> column (native). */
  def hyperplane_bucket(emb: Column, planes: Int, dim: Int): Column =
    ColumnShim.column(
      HyperplaneBucketExpr(ColumnShim.expr(emb), planes, dim))

  // ---- static helpers (called from generated code) ------------------------

  /** dot/(√Σa²·√Σb²) with the same left-to-right accumulation the HOF
    * version performs (dot over the zipped prefix, norms over each FULL
    * array), so results are bit-identical to `aggregate(zip_with(...))`.
    */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var sa = 0.0
    i = 0
    while (i < na) { val x = a.getDouble(i); sa += x * x; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val x = b.getDouble(i); sb += x * x; i += 1 }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  /** Deterministic ±1 plane matrix, built once per (planes, dim) per JVM. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def planeMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, dim),
      _ => Array.tabulate(planes)(p =>
        graft.similarity.Ann.planeVec(p, dim).toArray))

  /** Per-plane dot accumulated in the same element order as the HOF
    * `aggregate(zip_with(emb, plane, ...))`, sign → bit p.
    */
  def hyperplaneBucket(emb: ArrayData, planes: Int, dim: Int): Long = {
    val m = planeMatrix(planes, dim)
    val n = math.min(emb.numElements(), dim)
    var out = 0L
    var p = 0
    while (p < planes) {
      val v = m(p)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += emb.getDouble(d) * v(d); d += 1 }
      if (acc >= 0.0) out |= (1L << p)
      p += 1
    }
    out
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.functions.VectorFunctions.cosineSim($c1, $c2)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimExpr = copy(l, r)
  override def prettyName: String = "cosine_sim"
}

case class HyperplaneBucketExpr(child: Expression, planes: Int, dim: Int)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorFunctions.hyperplaneBucket(v.asInstanceOf[ArrayData], planes, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorFunctions.hyperplaneBucket($c, $planes, $dim)")
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr =
    copy(child = c)
  override def prettyName: String = "hyperplane_bucket"
}
