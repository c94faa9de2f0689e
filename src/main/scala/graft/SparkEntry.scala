package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.QualityPipeline
import graft.synth.SynthPages

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full quality pipeline (N1 langid + N2 perplexity + N3
    * heuristics + N4 scrub + N5 keep/drop) over a deterministic synthetic
    * page corpus sized like sf0.001, summarized per snapshot × decision.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = SynthPages.pages(spark, 2000L)
    QualityPipeline.annotate(pages)
      .groupBy(col("crawl_snapshot"), col("keep"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails") + col("n_phones") + col("n_cnps")).as("n_pii"),
        avg(col("ppl")).as("avg_ppl"))
      .orderBy(col("crawl_snapshot"), col("keep"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = analytics.Queries.oracle
}
