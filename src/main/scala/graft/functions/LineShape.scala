package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Expressions for the Gopher line-shape metrics (r6 optimization +
  * the r5 ADVICE item: the HOF `filter(split(...))` spellings in
  * [[graft.stages.Heuristics]] were CodegenFallback on a declared
  * corpus-scale quality-filter stage). Semantics are exactly the HOF
  * chains', which remain as `*Hof` parity references pinned in
  * LineShapeParitySpec:
  *
  *  - lines = `split(text, "\n")`, non-blank = `length(trim(l)) > 0`
  *    (Spark `trim` strips SPACES only);
  *  - bullet: first code point of `ltrim(l)` ∈ {•, ‣, ▪, -, *};
  *  - ellipsis: `rtrim(l)` ends with "..." or "…";
  *  - alpha word: token matches `\p{L}` anywhere (java regex `\p{L}` =
  *    `Character.isLetter` general categories);
  *  - each fraction is `count.toDouble / total`, 0.0 when the denominator
  *    is 0, null on null input.
  */
object LineShape {

  def bullet_line_frac(text: Column): Column =
    ColumnShim.column(BulletLineFracExpr(ColumnShim.expr(text)))

  def ellipsis_line_frac(text: Column): Column =
    ColumnShim.column(EllipsisLineFracExpr(ColumnShim.expr(text)))

  def alpha_word_frac(words: Column): Column =
    ColumnShim.column(AlphaWordFracExpr(ColumnShim.expr(words)))

  // ---- static helpers (called from generated code) ------------------------

  /** Visits each line [start, end) of `s` (split on '\n', trailing empty
    * line included like `split(text, "\n")` with its -1 limit) and folds
    * (nonBlank, hit) counts via `f`. Blank = all chars are ' '.
    */
  private def foldLines(s: String)(hit: (String, Int, Int) => Boolean): Double = {
    val n = s.length
    var lines = 0
    var hits = 0
    var start = 0
    var j = 0
    while (j <= n) {
      if (j == n || s.charAt(j) == '\n') {
        var k = start
        var blank = true
        while (blank && k < j) { if (s.charAt(k) != ' ') blank = false; k += 1 }
        if (!blank) {
          lines += 1
          if (hit(s, start, j)) hits += 1
        }
        start = j + 1
      }
      j += 1
    }
    if (lines == 0) 0.0 else hits.toDouble / lines
  }

  def bulletLineFrac(u: UTF8String): Double = {
    val s = u.toString
    foldLines(s) { (str, a, b) =>
      var i = a
      while (i < b && str.charAt(i) == ' ') i += 1 // ltrim: spaces only
      i < b && {
        val c = str.charAt(i)
        // first CODE POINT equals a bullet — all bullets are BMP chars, and
        // a high surrogate never equals one, so the char compare suffices
        c == '•' || c == '‣' || c == '▪' || c == '-' || c == '*'
      }
    }
  }

  def ellipsisLineFrac(u: UTF8String): Double = {
    val s = u.toString
    foldLines(s) { (str, a, b0) =>
      var b = b0
      while (b > a && str.charAt(b - 1) == ' ') b -= 1 // rtrim: spaces only
      (b - a >= 3 && str.charAt(b - 1) == '.' && str.charAt(b - 2) == '.' &&
        str.charAt(b - 3) == '.') ||
        (b > a && str.charAt(b - 1) == '…')
    }
  }

  def alphaWordFrac(words: ArrayData): Double = {
    val n = words.numElements()
    if (n == 0) return 0.0
    var hits = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        var j = 0
        var found = false
        while (!found && j < w.length) {
          val cp = w.codePointAt(j)
          if (Character.isLetter(cp)) found = true
          else j += Character.charCount(cp)
        }
        if (found) hits += 1
      }
      i += 1
    }
    hits.toDouble / n
  }
}

case class BulletLineFracExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bullet_line_frac requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    LineShape.bulletLineFrac(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LineShape.bulletLineFrac($c)")
  override protected def withNewChildInternal(c: Expression): BulletLineFracExpr =
    copy(c)
  override def prettyName: String = "bullet_line_frac"
}

case class EllipsisLineFracExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ellipsis_line_frac requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    LineShape.ellipsisLineFrac(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LineShape.ellipsisLineFrac($c)")
  override protected def withNewChildInternal(c: Expression): EllipsisLineFracExpr =
    copy(c)
  override def prettyName: String = "ellipsis_line_frac"
}

case class AlphaWordFracExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"alpha_word_frac requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    LineShape.alphaWordFrac(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LineShape.alphaWordFrac($c)")
  override protected def withNewChildInternal(c: Expression): AlphaWordFracExpr =
    copy(c)
  override def prettyName: String = "alpha_word_frac"
}
