package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming surface.
  *
  * The reference is incremental-batch (poll-for-next-shard, SURVEY §2.10),
  * which maps to the lineage/resume runner — but the engine also exposes a
  * streaming ingest path for the same page pipeline: `readStream` over a
  * landing directory → the identical annotate stages → `writeStream` with
  * checkpointing, plus event-time windowed aggregation with a watermark.
  * The quality stages are pure per-row transforms, so batch and streaming
  * share ALL scoring code (one definition of keep/drop).
  */
object StreamOps {

  /** Streaming variant of the quality pipeline over a parquet landing dir.
    * Identical per-row semantics to `QualityPipeline.annotate` — the same
    * fused scorer runs inside the micro-batch.
    */
  def annotateStream(spark: SparkSession, landingDir: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(landingDir)
      .as[graft.model.Page]
    graft.pipeline.QualityPipeline.annotate(pages)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** Event-time windowed counts with a watermark (late data bounded by
    * `lateness`): docs per (window, decision).
    */
  def windowedKeepCounts(annotated: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    annotated
      .withWatermark("warc_ts", lateness)
      .groupBy(window(col("warc_ts"), windowLen), col("keep"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"), col("keep"),
        col("n_docs"))
}
