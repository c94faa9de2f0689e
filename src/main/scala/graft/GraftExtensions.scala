package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimExpr, FingerprintExpr, HyperplaneBucketExpr, MinHashSigExpr, ShingleHashesExpr, SimHash64Expr}
import graft.stages.{CnpCountExpr, CnpScrubExpr}

/** SQL surface for the native expressions: usable either as a session
  * extension (`spark.sql.extensions=graft.GraftExtensions`) or by calling
  * [[GraftFunctions.registerAll]] on an existing session. All functions are
  * codegen-capable Catalyst expressions (no UDF boxing).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("scrub_cnp",
      info("scrub_cnp", "replaces checksum-valid Romanian CNPs with <CNP>"),
      (es: Seq[Expression]) => CnpScrubExpr(es.head)),
    ("count_cnp",
      info("count_cnp", "counts checksum-valid Romanian CNPs"),
      (es: Seq[Expression]) => CnpCountExpr(es.head)),
    ("doc_fingerprint",
      info("doc_fingerprint", "reflow-stable rolling-hash fingerprint of text"),
      (es: Seq[Expression]) => FingerprintExpr(es.head)),
    ("simhash64",
      info("simhash64", "64-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)),
    ("shingle_hashes",
      info("shingle_hashes", "hashes of word n-gram shingles (n literal)"),
      (es: Seq[Expression]) => ShingleHashesExpr(es.head,
        es(1).eval().asInstanceOf[Int])),
    ("minhash_signature",
      info("minhash_signature", "k-minhash signature of shingle hashes (k literal)"),
      (es: Seq[Expression]) => MinHashSigExpr(es.head,
        es(1).eval().asInstanceOf[Int])),
    ("cosine_sim",
      info("cosine_sim", "exact cosine similarity of two array<double>"),
      (es: Seq[Expression]) => CosineSimExpr(es.head, es(1))),
    ("hyperplane_bucket",
      info("hyperplane_bucket",
        "sign-bit hyperplane LSH bucket of array<double> (planes, dim literals)"),
      (es: Seq[Expression]) => HyperplaneBucketExpr(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int]))
  )

  /** Registers everything on an already-running session. */
  def registerAll(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    graft.functions.Annotations.registerSql(spark)
  }
}
