package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.model.{AnnotatedPage, Page, Thresholds}
import graft.stages.{Heuristics, LangIdModel, PerplexityModel, Scrub}

/** Row shape between the codegen'd heuristic/scrub stages and the batched
  * scorer (matched by name in `.as[...]`).
  */
final case class ScrubbedRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    crawl_snapshot: String,
    text: String,
    lang: String,
    doc_len_words: Int,
    mean_word_len: Double,
    symbol_word_ratio: Double,
    stopword_frac: Double,
    dup_line_frac: Double,
    n_emails: Int,
    n_phones: Int,
    n_cnps: Int,
    n_slurs: Int,
    scrubbed_text: String
)

/** C5 — per-stage metric accumulators (reference analogue: per-shard
  * progress prints, `fineweb/big_inference.py:228-232`); checkpointed into
  * the lineage table by `graft.lineage.Lineage`.
  */
final class PipelineMetrics(spark: SparkSession) extends Serializable {
  val docsIn: LongAccumulator = spark.sparkContext.longAccumulator("graft.docsIn")
  val docsKept: LongAccumulator = spark.sparkContext.longAccumulator("graft.docsKept")
  val docsPii: LongAccumulator = spark.sparkContext.longAccumulator("graft.docsPii")
  val docsToxic: LongAccumulator = spark.sparkContext.longAccumulator("graft.docsToxic")
}

/** The flagship quality pipeline (north rule): langid (N1) + perplexity (N2)
  * + Gopher/C4 heuristics (N3) + PII/toxicity scrub (N4) + keep/drop (N5)
  * over Common-Crawl-style pages.
  *
  * Physical shape (see SURVEY.md §4.3): one shuffle-free
  * WholeStageCodegen span (heuristics + scrub, pure expressions) feeding one
  * batched `mapPartitions` (langid + perplexity fused — a single pass, one
  * broadcast deref per partition), then the only shuffle: a salted
  * repartition before the partitioned write (skewed-host handling).
  */
object QualityPipeline {

  /** Crawl-snapshot label derived from warc_ts (partition key; the
    * reference's natural partition key is the `dump` snapshot name,
    * `fineweb/fineweb2_download.py:19`).
    */
  def snapshotCol(warcTs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    format_string("CC-MAIN-%d-%02d", year(warcTs), weekofyear(warcTs))

  /** Pure-scala keep decision — shared by the distributed scorer and the
    * scalar golden-label generator so decision semantics live in ONE place.
    * Conjunction shape mirrors F1/F2 threshold composition
    * (`small_model_inference/filter.py:22`, `ro_vs_eng/filter_jql.py:27`).
    */
  def decide(th: Thresholds, langPred: String, langConf: Double, ppl: Double,
      docLen: Int, meanWordLen: Double, symbolRatio: Double,
      stopwordFrac: Double, dupLineFrac: Double, nSlurs: Int): Boolean =
    langPred == "ron" && langConf >= th.minLangConf &&
      ppl <= th.maxPpl &&
      docLen >= th.minWords && docLen <= th.maxWords &&
      meanWordLen >= th.minMeanWordLen && meanWordLen <= th.maxMeanWordLen &&
      symbolRatio <= th.maxSymbolWordRatio &&
      stopwordFrac >= th.minStopwordFrac &&
      dupLineFrac <= th.maxDupLineFrac &&
      nSlurs <= th.maxSlurs

  /** Full annotation: Dataset[Page] → Dataset[AnnotatedPage]. No shuffle. */
  def annotate(pages: Dataset[Page], th: Thresholds = Thresholds.default,
      metrics: Option[PipelineMetrics] = None): Dataset[AnnotatedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._

    // column-prune early: html (the heavy binary) never leaves the scan
    val projected = pages.toDF.select(
      col("url"), col("warc_ts"), snapshotCol(col("warc_ts")).as("crawl_snapshot"),
      col("text"), col("lang"))
    val scrubbed = Scrub.withScrub(Heuristics.withHeuristics(projected))
      .as[ScrubbedRow]

    val bLangW = spark.sparkContext.broadcast(LangIdModel.weights)
    val bLm = spark.sparkContext.broadcast(PerplexityModel.default)

    scrubbed.mapPartitions { iter =>
      val w = bLangW.value // one deref per partition
      val lm = bLm.value
      iter.grouped(64).flatMap { batch =>
        batch.map { r =>
          val (pred, conf) = LangIdModel.predict(r.text, w)
          val ronConf = if (pred == "ron") conf else 1.0 - conf
          val ppl = lm.perplexity(r.text)
          val keep = decide(th, pred, ronConf, ppl, r.doc_len_words,
            r.mean_word_len, r.symbol_word_ratio, r.stopword_frac,
            r.dup_line_frac, r.n_slurs)
          metrics.foreach { m =>
            m.docsIn.add(1)
            if (keep) m.docsKept.add(1)
            if (r.n_emails + r.n_phones + r.n_cnps > 0) m.docsPii.add(1)
            if (r.n_slurs > 0) m.docsToxic.add(1)
          }
          AnnotatedPage(r.url, r.warc_ts, r.crawl_snapshot, r.text, r.lang,
            pred, ronConf, ppl, r.doc_len_words, r.mean_word_len,
            r.symbol_word_ratio, r.stopword_frac, r.dup_line_frac,
            r.scrubbed_text, r.n_emails, r.n_phones, r.n_cnps, r.n_slurs,
            keep)
        }
      }
    }
  }

  /** Salted, snapshot-partitioned write — the pipeline's only shuffle.
    * Salting spreads zipf-skewed hosts across `saltBuckets` writers per
    * snapshot (north rule: "salted repartitioning for skewed hosts");
    * at cluster scale the same call writes an Iceberg table
    * (`.writeTo(t).overwritePartitions()`) — parquet here because the
    * sandbox ships no Iceberg runtime.
    */
  def writeAnnotated(ds: Dataset[AnnotatedPage], outPath: String,
      saltBuckets: Int = 32): Unit = {
    ds.repartition(saltBuckets, col("crawl_snapshot"),
        pmod(xxhash64(col("url")), lit(saltBuckets)))
      .write.mode("overwrite")
      .partitionBy("crawl_snapshot")
      .parquet(outPath)
  }

  /** annotate + keep-only + write, end-to-end. */
  def run(pages: Dataset[Page], outPath: String,
      th: Thresholds = Thresholds.default,
      metrics: Option[PipelineMetrics] = None,
      keepOnly: Boolean = false, saltBuckets: Int = 32): Unit = {
    val annotated = annotate(pages, th, metrics)
    val out = if (keepOnly) annotated.filter(_.keep) else annotated
    writeAnnotated(out, outPath, saltBuckets)
  }
}
