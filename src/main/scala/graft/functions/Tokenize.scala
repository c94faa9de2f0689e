package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer Expressions for the two tokenization contracts the
  * engine's hot paths share (r6 optimization: Catalyst higher-order
  * functions are CodegenFallback — the HOF spellings ran interpreted, one
  * lambda-tree evaluation per TOKEN, with a fresh regex Matcher per
  * `regexp_replace` call; these run one static call per ROW inside
  * whole-stage codegen).
  *
  * Each expression is defined as "exactly what the HOF chain computes":
  *  - [[Tokenize.words_ws]] ≡ `filter(split(text, "\\s+"), w => length(w)
  *    > 0)` — the [[graft.stages.Heuristics.wordsCol]] contract. Java-regex
  *    `\s` is the ASCII set [ \t\n\f\r]; those code points are
  *    single-byte in UTF-8 and never occur inside a multi-byte sequence,
  *    so the split runs directly over the UTF-8 bytes with zero decode.
  *  - [[Tokenize.norm_tokens]] ≡ `filter(transform(split(lower(text),
  *    "\\s+"), w => regexp_replace(w, "(?U)^\\W+|\\W+$", "")), w =>
  *    length(w) > 0)` — the [[TextFunctions.normTokens]] contract.
  *    `lower` delegates to the same `UTF8String.toLowerCase` Spark's
  *    `Lower` uses (UTF8_BINARY collation), and the `(?U)\W` edge trim
  *    drops leading/trailing runs of non-word code points, where "word"
  *    is java.util.regex's UNICODE_CHARACTER_CLASS `\w`:
  *    `Alphabetic ∪ {Mn, Me, Mc, Nd, Pc} ∪ Join_Control` —
  *    [[Tokenize.isWordCp]] implements that predicate directly and
  *    TokenizeParitySpec pins it code-point-by-code-point against a real
  *    `Pattern.compile("(?U)\\w")`.
  *
  * The HOF spellings remain in their original homes as `*Hof` parity
  * references; TokenizeParitySpec pins byte-identical outputs over every
  * text fixture family (diacritics, blank runs, punctuation-only tokens,
  * supplementary-plane code points).
  */
object Tokenize {

  def words_ws(text: Column): Column =
    ColumnShim.column(WordsWsExpr(ColumnShim.expr(text)))

  def norm_tokens(text: Column): Column =
    ColumnShim.column(NormTokensExpr(ColumnShim.expr(text)))

  // ---- static helpers (called from generated code) ------------------------

  /** java-regex default `\s`: the six ASCII whitespace chars. */
  @inline private def isWsByte(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0B.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Maximal runs of non-`\s` bytes as UTF8String slices — exactly the
    * non-empty tokens of `split(text, "\\s+")`.
    */
  def wordsWs(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // copies only when the string is a slice
    val n = bytes.length
    val out = new java.util.ArrayList[Any](16)
    var i = 0
    while (i < n) {
      while (i < n && isWsByte(bytes(i))) i += 1
      val start = i
      while (i < n && !isWsByte(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  /** java.util.regex `\w` under UNICODE_CHARACTER_CLASS, per code point:
    * Alphabetic, the Mn/Me/Mc/Nd/Pc general categories, or Join_Control
    * (ZWNJ/ZWJ). Pinned against `Pattern.compile("(?U)\\w")` in
    * TokenizeParitySpec.
    */
  def isWordCp(cp: Int): Boolean =
    Character.isAlphabetic(cp) || cp == 0x200C || cp == 0x200D || {
      val t = Character.getType(cp)
      t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
        t == Character.COMBINING_SPACING_MARK ||
        t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.CONNECTOR_PUNCTUATION
    }

  /** java-regex default `\s` on a char (tokens are split before trimming,
    * so this only guards the scan bounds).
    */
  @inline private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** lower → ASCII-\s split → `(?U)\W` edge trim → drop empties, one pass.
    * Lowercasing via `UTF8String.toLowerCase` — the same call Spark's
    * `Lower` makes under the default UTF8_BINARY collation.
    */
  def normTokens(s: UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val n = str.length
    val out = new java.util.ArrayList[Any](16)
    var i = 0
    while (i < n) {
      while (i < n && isWsChar(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWsChar(str.charAt(i))) i += 1
      if (i > start) {
        // (?U)\W+ edge trim on the token [start, i), by code point
        var a = start
        while (a < i && !isWordCp(str.codePointAt(a)))
          a += Character.charCount(str.codePointAt(a))
        var b = i
        while (b > a && !isWordCp(str.codePointBefore(b)))
          b -= Character.charCount(str.codePointBefore(b))
        if (b > a)
          out.add(UTF8String.fromString(str.substring(a, b)))
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class WordsWsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"words_ws requires string, got ${t.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Tokenize.wordsWs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.wordsWs($c)")
  override protected def withNewChildInternal(c: Expression): WordsWsExpr =
    copy(c)
  override def prettyName: String = "words_ws"
}

case class NormTokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"norm_tokens requires string, got ${t.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Tokenize.normTokens(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.normTokens($c)")
  override protected def withNewChildInternal(c: Expression): NormTokensExpr =
    copy(c)
  override def prettyName: String = "norm_tokens"
}
