package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Membership counting of an `array<long>` column against a fixed, plan-
  * embedded sorted long set — the stateless primitive behind streaming
  * decontamination: the eval set's gram hashes ride inside the expression
  * (one binary-search per element, no join, no shuffle, no state), so the
  * SAME filter runs identically on batch frames and on Structured
  * Streaming micro-batches.
  *
  * The set is held as a SORTED array (binary search) rather than a hash
  * set: it serializes compactly into the plan (8 bytes/gram — a 400k-gram
  * eval set is ~3 MB, shipped once per executor like a broadcast) and
  * needs no rehash on deserialization.
  */
object LongSetOps {

  /** Count of array elements present in `sorted` (distinct or not — the
    * caller dedups if distinct semantics are wanted). The set is
    * defensively copied and re-sorted at plan-build time (r5 ADVICE:
    * binary search over an unsorted caller array would silently
    * miscount) — O(k log k) once per plan, free for the already-sorted
    * arrays [[graft.dedup.Decontaminate.benchGramArray]] builds.
    */
  def count_in_set(arr: Column, sorted: Array[Long]): Column = {
    val s = sorted.clone()
    java.util.Arrays.sort(s)
    ColumnShim.column(CountInSortedSetExpr(ColumnShim.expr(arr), s))
  }

  // ---- static helper (called from generated code) --------------------------

  def countIn(arr: ArrayData, sorted: Array[Long]): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) hits += 1
      i += 1
    }
    hits
  }
}

/** `sorted` MUST be sorted ascending (callers build it via `.sorted`). */
case class CountInSortedSetExpr(child: Expression, sorted: Array[Long])
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  // render the set by SIZE, not the array's identity hash — plan strings
  // must stay byte-stable across runs (PLANS.md/golden regen discipline)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${sorted.length} grams>")
  override def nullSafeEval(v: Any): Any =
    LongSetOps.countIn(v.asInstanceOf[ArrayData], sorted)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("sortedLongSet", sorted, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LongSetOps.countIn($c, $setRef)")
  }
  override protected def withNewChildInternal(c: Expression): CountInSortedSetExpr =
    copy(child = c)
  override def prettyName: String = "count_in_set"
}
