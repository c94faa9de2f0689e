package graft.stages

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass CNP (Romanian personal-numeric-code) detector/scrubber.
  *
  * A regex alone cannot express the CNP checksum (weights 279146358279 mod
  * 11), and the FIXTURES spec requires invalid-checksum 13-digit lookalikes
  * to pass through byte-identical. This is therefore a native Catalyst
  * `Expression` pair with real `doGenCode` (a static-call, so the stage stays
  * inside whole-stage codegen), O(n) over the string — cheaper than a regex
  * candidate scan + UDF validation at 100 TB.
  */
object CnpScrubber {
  private val weights: Array[Int] = "279146358279".map(_ - '0').toArray
  final val Token = "<CNP>"

  /** True iff s[from, from+13) is a checksum-valid CNP with lead digit 1-8. */
  def isValidCnp(s: CharSequence, from: Int): Boolean = {
    val lead = s.charAt(from)
    if (lead < '1' || lead > '8') return false
    var sum = 0
    var i = 0
    while (i < 12) { sum += (s.charAt(from + i) - '0') * weights(i); i += 1 }
    val r = sum % 11
    val ck = if (r == 10) 1 else r
    s.charAt(from + 12) - '0' == ck
  }

  /** Scan for maximal digit runs; a run of exactly 13 digits that validates
    * is replaced by [[Token]]; everything else is copied byte-identically.
    */
  def scrub(s: String): String = {
    val n = s.length
    var i = 0
    var sb: java.lang.StringBuilder = null
    var copied = 0
    while (i < n) {
      if (Character.isDigit(s.charAt(i))) {
        val start = i
        while (i < n && Character.isDigit(s.charAt(i))) i += 1
        if (i - start == 13 && isValidCnp(s, start)) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, copied, start).append(Token)
          copied = i
        }
      } else i += 1
    }
    if (sb == null) s
    else { sb.append(s, copied, n); sb.toString }
  }

  def count(s: String): Int = {
    val n = s.length
    var i = 0
    var c = 0
    while (i < n) {
      if (Character.isDigit(s.charAt(i))) {
        val start = i
        while (i < n && Character.isDigit(s.charAt(i))) i += 1
        if (i - start == 13 && isValidCnp(s, start)) c += 1
      } else i += 1
    }
    c
  }

  // UTF8String entry points for codegen (static calls keep codegen whole).
  def scrubU(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = scrub(str)
    if (out eq str) s else UTF8String.fromString(out)
  }
  def countU(s: UTF8String): Int = count(s.toString)

  def scrub_cnp(c: Column): Column = ColumnShim.column(CnpScrubExpr(ColumnShim.expr(c)))
  def count_cnp(c: Column): Column = ColumnShim.column(CnpCountExpr(ColumnShim.expr(c)))
}

case class CnpScrubExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    CnpScrubber.scrubU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.stages.CnpScrubber.scrubU($c)")
  override protected def withNewChildInternal(c: Expression): CnpScrubExpr = copy(c)
  override def prettyName: String = "scrub_cnp"
}

case class CnpCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    CnpScrubber.countU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.stages.CnpScrubber.countU($c)")
  override protected def withNewChildInternal(c: Expression): CnpCountExpr = copy(c)
  override def prettyName: String = "count_cnp"
}
