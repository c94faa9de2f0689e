package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Source/sink operators from SURVEY.md §2.1.
  *
  *  - S2 fixed-size shard write: `maxRecordsPerFile` bounds rows per file
  *    (the reference's 1,300-doc JSON shards, `fineweb/fineweb2_download.py:
  *    12,27-37`); shard id kept as a LOGICAL column — physical files are
  *    sized for the filesystem, not the shard (SURVEY §7.3).
  *  - S3 dual (backup) write: same DataFrame to primary + backup sinks
  *    (`small_model_inference/shard_manager.py:60-67`); the input is
  *    persisted so the lineage is computed once, not twice.
  *  - S7 typed export: declared schema with the reference's int_score→string
  *    cast quirk (`dataset_upload.py:16,34` — parse failures produce the
  *    in-band "ERROR" sentinel, so the column is exported as string).
  */
object Writers {
  val ShardSize = 1300

  /** S2 — shard-bounded write. `shard_id = rowId / ShardSize` mirrors
    * `fineweb2_download.py:53`'s `idx // SHARD_SIZE`.
    */
  def writeSharded(df: DataFrame, rowIdCol: String, path: String,
      shardSize: Int = ShardSize): Unit =
    df.withColumn("shard_id", (col(rowIdCol) / shardSize).cast("int"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", shardSize)
      .parquet(path)

  /** S2 (JSON form) — the reference's actual shard format: UTF-8 JSON lines
    * with raw (non-ASCII-escaped) diacritics, `ensure_ascii=False` at
    * `fineweb/fineweb2_download.py:32`. Spark's JSON sink writes UTF-8
    * without \\u escapes, so Romanian text round-trips byte-identical
    * (WritersSpec pins it).
    */
  def writeShardedJson(df: DataFrame, rowIdCol: String, path: String,
      shardSize: Int = ShardSize): Unit =
    df.withColumn("shard_id", (col(rowIdCol) / shardSize).cast("int"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", shardSize)
      .json(path)

  /** S3 — dual write: primary + backup. One computation, two sinks. */
  def writeDual(df: DataFrame, primary: String, backup: String): Unit = {
    val cached = df.persist()
    try {
      cached.write.mode(SaveMode.Overwrite).parquet(primary)
      cached.write.mode(SaveMode.Overwrite).parquet(backup)
    } finally cached.unpersist()
  }

  /** S7 — typed export with the int_score→string cast and 500 MB-ish target
    * file size via maxRecordsPerFile (the reference targets 500 MB output
    * shards, `dataset_upload.py:47-60`).
    */
  def exportTyped(df: DataFrame, path: String,
      maxRecordsPerFile: Int = 500000): Unit = {
    val out =
      if (df.columns.contains("int_score"))
        df.withColumn("int_score", col("int_score").cast("string"))
      else df
    out.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }
}
