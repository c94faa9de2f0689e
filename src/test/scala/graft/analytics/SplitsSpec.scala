package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Split-integrity self-test (mirrors `training/shard_loader.py:58-86`):
  * 16 test shards, 8 val shards, pairwise disjoint, duplicate-free.
  */
class SplitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("shard split sizes and disjointness") {
    assert(Splits.testShards.size == 16)
    assert(Splits.valShards.size == 8)
    assert(Splits.testShards.toSet.intersect(Splits.valShards.toSet).isEmpty)
  }

  test("withSplit assigns shards by rowId/1300 and splits by membership") {
    import spark.implicits._
    val df = Splits.withSplit(
      (0L until 60000L by 500L).toDF("row_id"), "row_id")
    val bad = df.filter(
      (col("shard_id").isin(Splits.testShards: _*) && col("split") =!= "test") ||
      (col("shard_id").isin(Splits.valShards: _*) && col("split") =!= "val") ||
      (!col("shard_id").isin(Splits.testShards ++ Splits.valShards: _*) &&
        col("split") =!= "train")).count()
    assert(bad == 0)
    assert(df.filter(col("row_id") === 1300L * 5)
      .select("shard_id").head().getInt(0) == 5)
  }

  test("train anti-membership excludes exactly test∪val (disjoint, no dups)") {
    import spark.implicits._
    val df = (0 until 41).toDF("shard_id")
    val train = Splits.trainOnly(df, "shard_id")
      .select("shard_id").collect().map(_.getInt(0)).toSet
    val testVal = (Splits.testShards ++ Splits.valShards).toSet
    assert(train.intersect(testVal).isEmpty)
    assert(train.union(testVal) == (0 until 41).toSet)
    // U2 INTERSECT disjointness as the reference asserts it
    val inter = df.filter(col("shard_id").isin(Splits.testShards: _*))
      .intersect(df.filter(col("shard_id").isin(Splits.valShards: _*)))
    assert(inter.isEmpty)
  }
}
