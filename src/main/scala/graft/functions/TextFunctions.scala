package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives for the training-data pipeline: token counting,
  * document fingerprinting (rolling hash), SimHash, and shingle hashing —
  * each as either a codegen'd built-in chain or a native Expression with a
  * static-call `doGenCode` (never a boxed row-at-a-time UDF).
  */
object TextFunctions {

  /** X7 — whitespace token count (documented divergence from the reference's
    * HF tokenizer: `small_model_inference/token_stats.py:11-13`).
    */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), w => length(w) > 0))

  /** GPT-2-style pretokenizer pattern, restricted to constructs both
    * java.util.regex and RE2 (the DuckDB oracle) support (no lookahead):
    * contraction suffixes, space-prefixed letter runs, space-prefixed digit
    * runs, space-prefixed punctuation runs, residual whitespace runs. The
    * token COUNT under this pattern tracks a BPE tokenizer's pre-split
    * count — the budget-estimation proxy for the reference's HF tokenizer
    * (`token_stats.py:11-13`) when the real vocab isn't loadable.
    */
  val BpeIshPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** X7 variant — BPE-ish pretoken count via the codegen'd regexp engine. */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit(BpeIshPattern))

  /** Lowercased word tokens with punctuation-trimmed edges — a native
    * codegen Expression since r6 ([[Tokenize.norm_tokens]]): the HOF
    * spelling ran CodegenFallback-interpreted, one regexp Matcher per
    * token, at the head of every minhash/simhash signature pass.
    * [[normTokensHof]] stays as the parity reference (TokenizeParitySpec).
    */
  def normTokens(text: Column): Column =
    Tokenize.norm_tokens(text)

  /** HOF reference of [[normTokens]] (parity tests only). */
  private[graft] def normTokensHof(text: Column): Column =
    filter(
      transform(split(lower(text), "\\s+"),
        w => regexp_replace(w, "(?U)^\\W+|\\W+$", "")),
      w => length(w) > 0)

  def doc_fingerprint(c: Column): Column =
    ColumnShim.column(FingerprintExpr(ColumnShim.expr(c)))

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64Expr(ColumnShim.expr(tokens)))

  def shingle_hashes(tokens: Column, n: Int): Column =
    ColumnShim.column(ShingleHashesExpr(ColumnShim.expr(tokens), n))

  // ---- static helpers (called from generated code) ------------------------

  /** Rolling polynomial hash (base 31, 64-bit wraparound) over the text with
    * whitespace runs collapsed to single spaces and lowercased — so
    * fingerprints are stable under reflow but sensitive to content.
    */
  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    var h = 1125899906842597L
    var prevSpace = true
    var i = 0
    while (i < str.length) {
      val c0 = str.charAt(i)
      val isSpace = Character.isWhitespace(c0)
      if (!isSpace) {
        h = 31 * h + Character.toLowerCase(c0)
        prevSpace = false
      } else if (!prevSpace) {
        h = 31 * h + ' '
        prevSpace = true
      }
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array: per bit, sum +1/−1 votes weighted by
    * token hashes; the sign picks the bit. O(64·n) with no allocation.
    */
  def simhashTokens(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = graft.synth.Det.mix64(
          arr.getUTF8String(i).hashCode.toLong ^ 0xc2b2ae3d27d4eb4fL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hashes of the n-gram shingles of a token array (MinHash input). */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i + n <= len) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      while (j < n) {
        val t = if (arr.isNullAt(i + j)) "" else arr.getUTF8String(i + j).toString
        h = graft.synth.Det.mix64(h ^ t.hashCode.toLong)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhash_signature(shingles: Column, k: Int): Column =
    ColumnShim.column(MinHashSigExpr(ColumnShim.expr(shingles), k))

  /** Deterministic affine constants for the MinHash family (odd a_j). */
  val MinHashMaxK = 64
  val minA: Array[Long] =
    Array.tabulate(MinHashMaxK)(j => graft.synth.Det.mix64(0xa5a5a5a5L + j) | 1L)
  val minB: Array[Long] =
    Array.tabulate(MinHashMaxK)(j => graft.synth.Det.mix64(0x5a5a5a5aL - j))

  def minhashSigK(arr: ArrayData, k: Int): ArrayData =
    minhashSig(arr, k, minA, minB)

  /** MinHash signature: min over the affine family (a_j·s + b_j) with 64-bit
    * wraparound (ANSI-safe — Column arithmetic would overflow-check). One
    * pass over the shingles for all k hashes.
    */
  def minhashSig(arr: ArrayData, k: Int, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = arr.getLong(i) * a(j) + b(j) // intentional wraparound
        if (h < m) m = h
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  def hamming(a: Column, b: Column): Column = {
    // bit_count(a XOR b) — pure built-ins, codegen
    bit_count(a.bitwiseXOR(b))
  }
}

case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextFunctions.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.fingerprint($c)")
  override protected def withNewChildInternal(c: Expression): FingerprintExpr = copy(c)
  override def prettyName: String = "doc_fingerprint"
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextFunctions.simhashTokens(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.simhashTokens($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(c)
  override def prettyName: String = "simhash64"
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextFunctions.minhashSigK(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.minhashSigK($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextFunctions.shingles(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}
