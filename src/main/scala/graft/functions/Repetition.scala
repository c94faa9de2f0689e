package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Gopher-style repetition signals (Rae et al. 2021, appendix A1.1) as
  * native per-row Expressions — the scale-correct shape for 10^12 docs: no
  * explode, no per-doc groupBy shuffle, one codegen'd pass per row.
  *
  * Two metrics over a word-token array:
  *  - `top_ngram_char_frac(tokens, n)`: the fraction of word characters
  *    covered by occurrences of the single most frequent word n-gram
  *    (Gopher applies this for n ∈ 2..4).
  *  - `dup_ngram_char_frac(tokens, n)`: the fraction of word characters
  *    covered by ANY n-gram that occurs more than once, counting each
  *    character once even when overlapping duplicate grams cover it
  *    repeatedly — the paper's "taking care not to count characters more
  *    than once" rule (Gopher applies this for n ∈ 5..10).
  *
  * Cross-engine determinism (the DuckDB oracle mirrors both):
  *  - characters are Unicode code points (DuckDB `len()`), not UTF-16 units;
  *  - separators between words are not counted — a gram's char length is the
  *    sum of its word lengths;
  *  - the top gram breaks ties by (count DESC, gram char length DESC, first
  *    occurrence ASC) — engine-neutral, no string collation involved.
  *
  * The learned quality gates in the reference consume per-doc scalar
  * signals of exactly this shape (`small_model_inference/filter.py:22`);
  * repetition is the canonical Gopher addition the north rule's
  * "Gopher/C4-style heuristic filters" family implies beyond the five
  * baseline metrics in [[graft.stages.Heuristics]].
  */
object Repetition {

  def top_ngram_char_frac(tokens: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    ColumnShim.column(TopNgramFracExpr(ColumnShim.expr(tokens), n))
  }

  def dup_ngram_char_frac(tokens: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    ColumnShim.column(DupNgramFracExpr(ColumnShim.expr(tokens), n))
  }

  /** The space-joined n-gram STRINGS of a token array (empty when < n
    * tokens) — one codegen'd pass; the HOF spelling
    * (`transform(sequence(...), i => array_join(slice(...)))`) is
    * CodegenFallback and ~7× slower on the vocab query.
    */
  def ngram_strings(tokens: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    ColumnShim.column(NgramStringsExpr(ColumnShim.expr(tokens), n))
  }

  /** Gopher's published repetition bounds (Rae et al. 2021, table A1): a
    * document is dropped when ANY signal exceeds its bound.
    */
  val GopherTopThresholds: Map[Int, Double] =
    Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val GopherDupThresholds: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  // the ONE cross-engine tokenization contract ("\s+ split, empties
  // dropped") lives in Heuristics.wordsCol — do not re-implement it
  private def words(textCol: Column): Column =
    graft.stages.Heuristics.wordsCol(textCol)

  /** Appends `top{n}gram_char_frac` / `dup{n}gram_char_frac` columns for the
    * requested window sizes — still one codegen'd pass per row, no shuffle.
    */
  def withRepetitionSignals(
      df: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      topNs: Seq[Int] = GopherTopThresholds.keys.toSeq.sorted,
      dupNs: Seq[Int] = GopherDupThresholds.keys.toSeq.sorted)
      : org.apache.spark.sql.DataFrame = {
    val w = words(org.apache.spark.sql.functions.col(textCol))
    val cols =
      topNs.map(n => s"top${n}gram_char_frac" -> top_ngram_char_frac(w, n)) ++
      dupNs.map(n => s"dup${n}gram_char_frac" -> dup_ngram_char_frac(w, n))
    df.withColumns(cols.toMap)
  }

  /** TRUE when the document passes every Gopher repetition bound — the
    * ready-made keep predicate for a quality-filter stage.
    */
  def gopherRepetitionKeep(textCol: Column): Column = {
    val w = words(textCol)
    val checks =
      GopherTopThresholds.toSeq.sorted.map { case (n, t) =>
        top_ngram_char_frac(w, n) <= t
      } ++
      GopherDupThresholds.toSeq.sorted.map { case (n, t) =>
        dup_ngram_char_frac(w, n) <= t
      }
    checks.reduce(_ && _)
  }

  // ---- static helpers (called from generated code) ------------------------

  private def tokenStrings(arr: ArrayData): Array[String] = {
    val len = arr.numElements()
    val out = new Array[String](len)
    var i = 0
    while (i < len) {
      out(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    out
  }

  private def codePoints(s: String): Int = s.codePointCount(0, s.length)

  /** Gram key for identity: tokens joined by a space — unambiguous because
    * the tokens are whitespace-split words and cannot contain one.
    */
  private def gramKey(toks: Array[String], u: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder(toks(u))
    var j = 1
    while (j < n) { sb.append(' ').append(toks(u + j)); j += 1 }
    sb.toString
  }

  def ngramStringsData(arr: ArrayData, n: Int): ArrayData = {
    val toks = tokenStrings(arr)
    val len = toks.length
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var u = 0
    while (u + n <= len) {
      out(u) = org.apache.spark.unsafe.types.UTF8String
        .fromString(gramKey(toks, u, n))
      u += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def topNgramFrac(arr: ArrayData, n: Int): Double = {
    val toks = tokenStrings(arr)
    val len = toks.length
    var total = 0L
    var i = 0
    while (i < len) { total += codePoints(toks(i)); i += 1 }
    if (total == 0L || len < n) return 0.0
    // gram -> (count, charLen, firstPos)
    val counts = new mutable.HashMap[String, Array[Long]]()
    var u = 0
    var gl = 0L // rolling char length of the window [u, u+n)
    var j = 0
    while (j < n) { gl += codePoints(toks(j)); j += 1 }
    while (u + n <= len) {
      val rec = counts.getOrElseUpdate(gramKey(toks, u, n), Array(0L, gl, u.toLong))
      rec(0) += 1L
      if (u + n < len) gl += codePoints(toks(u + n)) - codePoints(toks(u))
      u += 1
    }
    // max by (count, charLen, -firstPos)
    var bestCnt = -1L; var bestGl = -1L; var bestPos = Long.MaxValue
    counts.valuesIterator.foreach { rec =>
      val (c, g, p) = (rec(0), rec(1), rec(2))
      if (c > bestCnt || (c == bestCnt && (g > bestGl ||
          (g == bestGl && p < bestPos)))) {
        bestCnt = c; bestGl = g; bestPos = p
      }
    }
    (bestCnt * bestGl).toDouble / total.toDouble
  }

  def dupNgramFrac(arr: ArrayData, n: Int): Double = {
    val toks = tokenStrings(arr)
    val len = toks.length
    var total = 0L
    var i = 0
    while (i < len) { total += codePoints(toks(i)); i += 1 }
    if (total == 0L || len < n) return 0.0
    val counts = new mutable.HashMap[String, Int]()
    var u = 0
    while (u + n <= len) {
      val k = gramKey(toks, u, n)
      counts.update(k, counts.getOrElse(k, 0) + 1)
      u += 1
    }
    // union of positions covered by grams with count >= 2, each word once
    val covered = new Array[Boolean](len)
    u = 0
    while (u + n <= len) {
      if (counts(gramKey(toks, u, n)) >= 2) {
        var j = 0
        while (j < n) { covered(u + j) = true; j += 1 }
      }
      u += 1
    }
    var cc = 0L
    i = 0
    while (i < len) { if (covered(i)) cc += codePoints(toks(i)); i += 1 }
    cc.toDouble / total.toDouble
  }
}

case class NgramStringsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Repetition.ngramStringsData(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Repetition.ngramStringsData($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramStringsExpr =
    copy(child = c)
  override def prettyName: String = "ngram_strings"
}

case class TopNgramFracExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    Repetition.topNgramFrac(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Repetition.topNgramFrac($c, $n)")
  override protected def withNewChildInternal(c: Expression): TopNgramFracExpr =
    copy(child = c)
  override def prettyName: String = "top_ngram_char_frac"
}

case class DupNgramFracExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    Repetition.dupNgramFrac(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Repetition.dupNgramFrac($c, $n)")
  override protected def withNewChildInternal(c: Expression): DupNgramFracExpr =
    copy(child = c)
  override def prettyName: String = "dup_ngram_char_frac"
}
