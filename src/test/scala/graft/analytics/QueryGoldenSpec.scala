package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tools.{QueryCanon, QueryGoldenGen}

/** Every no-oracle query (no DuckDB SQL for the driver) is pinned to a
  * committed golden artifact over the sf0.001 fixture tables — cross-round
  * drift in the non-SQL-expressible operators fails here exactly like an
  * oracle mismatch fails in the driver. A query added without EITHER an
  * oracle or a golden fails the first assertion.
  */
class QueryGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every no-oracle query has a committed golden") {
    QueryGoldenGen.noOracleQueries.foreach { name =>
      assert(getClass.getResource(s"/golden_queries/$name.txt") != null,
        s"$name has neither a DuckDB oracle nor a committed golden — " +
          "run `sbt \"runMain graft.tools.QueryGoldenGen\"` and commit")
    }
  }

  QueryGoldenGen.noOracleQueries.foreach { name =>
    test(s"$name matches its committed golden") {
      val in = getClass.getResourceAsStream(s"/golden_queries/$name.txt")
      assume(in != null) // reported by the first test
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      val golden = try src.getLines().toVector finally src.close()
      val got = QueryCanon.canonical(
        graft.SparkEntry.queries(name)(spark, QueryGoldenGen.SfDir))
      assert(got.length == golden.length,
        s"row count ${got.length} != golden ${golden.length}")
      val diffs = got.zip(golden).zipWithIndex.collect {
        case ((a, b), i) if a != b => s"row $i: got=$a golden=$b"
      }
      assert(diffs.isEmpty, diffs.take(3).mkString("; "))
    }
  }
}
