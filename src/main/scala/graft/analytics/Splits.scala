package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J3 — shard-based train/val/test split semantics
  * (`training/shard_loader.py:8-10,24-42`): TEST = shards 1–16,
  * VAL = 17–24, TRAIN = everything else (anti-membership).
  */
object Splits {
  val testShards: Seq[Int] = 1 to 16
  val valShards: Seq[Int] = 17 to 24

  def splitCol(shardId: Column): Column =
    when(shardId.isin(testShards: _*), "test")
      .when(shardId.isin(valShards: _*), "val")
      .otherwise("train")

  /** Adds `shard_id` (rowId / 1300, `fineweb2_download.py:12,53`) and
    * `split`.
    */
  def withSplit(df: DataFrame, rowIdCol: String,
      shardSize: Int = 1300): DataFrame =
    df.withColumn("shard_id", (col(rowIdCol) / shardSize).cast("int"))
      .withColumn("split", splitCol(col("shard_id")))

  /** Train shards = LEFT ANTI membership vs test ∪ val. */
  def trainOnly(df: DataFrame, shardIdCol: String): DataFrame =
    df.filter(!col(shardIdCol).isin(testShards ++ valShards: _*))
}
