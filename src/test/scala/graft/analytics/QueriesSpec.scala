package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Every registered query runs on sf0.001 and returns rows; every oracle key
  * exists in queries; column names match the contract expectations.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val missing = Queries.oracle.keySet -- Queries.all.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  Queries.all.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
