package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decode/feature-extract as batched `mapPartitions` (the JVM analogue of
  * `mapInPandas` — batch shape, schema and partitioning are real; only the
  * codec itself is stubbed because no image/audio libraries ship in this
  * container).
  */
object Multimodal {

  final case class MediaMeta(
      mime: String,
      n_bytes: Long,
      payload_hash: Long
  )

  /** Magic-byte MIME sniffing as pure columns (real logic, codegen). */
  def sniffMime(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hexPrefix = hex(substring(bin, 1, 8))
    when(hexPrefix.startsWith("FFD8FF"), "image/jpeg")
      .when(hexPrefix.startsWith("89504E47"), "image/png")
      .when(hexPrefix.startsWith("47494638"), "image/gif")
      .when(hexPrefix.startsWith("494433"), "audio/mpeg")
      .when(hexPrefix.startsWith("1A45DFA3"), "video/webm")
      .when(hexPrefix.startsWith("3C68746D6C") || hexPrefix.startsWith("3C21444F"),
        "text/html")
      .otherwise("application/octet-stream")
  }

  /** Metadata projection over a binary column — length, sniffed mime,
    * content hash. Pure columns, no decode.
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumns(Map(
      "mime" -> sniffMime(col(binCol)),
      "n_bytes" -> length(col(binCol)).cast("long"),
      "payload_hash" -> xxhash64(col(binCol))
    ))

  /** STUB — deterministic fake decoder standing in for a real image/audio
    * codec (none available in this container). Produces a feature vector as
    * a pure function of the payload bytes so tests are reproducible. The
    * Spark-side contract (batched iterator in, fixed-dim float vector out)
    * is exactly what a real `mapInPandas`/JNI decoder plugs into.
    */
  def stubDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < payload.length) {
      h = graft.synth.Det.mix64(h ^ payload(i))
      out(i % dim) += ((h & 0xffff) / 65536.0f - 0.5f)
      i += 1
    }
    out
  }

  final case class MediaFeatures(url: String, mime: String, n_bytes: Long,
      features: Array[Float])

  /** Batched feature extraction over (url, payload) rows. Batch size mirrors
    * the reference's inference batching (32, `small_model_inference/
    * small_model_inference.py:46`); the iterator shape keeps one decoder
    * context per partition.
    */
  def extractFeatures(rows: Dataset[(String, Array[Byte])],
      dim: Int = 16, batchSize: Int = 32): Dataset[MediaFeatures] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // a real decoder would decode the whole batch here (vectorized)
        batch.map { case (url, payload) =>
          val mime = payload match {
            case p if p.length >= 3 && (p(0) & 0xff) == 0xff &&
              (p(1) & 0xff) == 0xd8 => "image/jpeg"
            case p if p.length >= 5 && p.startsWith("<html".getBytes) => "text/html"
            case _ => "application/octet-stream"
          }
          MediaFeatures(url, mime, payload.length.toLong,
            stubDecodeFeatures(payload, dim))
        }
      }
    }
  }
}
