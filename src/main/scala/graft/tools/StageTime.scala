package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate pipeline stage costs under Spark. */
object StageTime {
  def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 100000L

    def pages = graft.synth.SynthPages.pages(spark, n, partitions = 64)

    // global warmup: JIT the whole path once
    graft.pipeline.QualityPipeline.run(
      graft.synth.SynthPages.pages(spark, 30000L, partitions = 64),
      "/tmp/stagetime_warm")

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      t("gen only (count)") { pages.map(_.text.length).filter(_ > 0).count() }
      t("gen+scrub (noop write)") {
        graft.stages.Scrub.withScrub(pages.toDF
          .select("url", "warc_ts", "text", "lang"))
          .write.format("noop").mode("overwrite").save()
      }
      t("annotate (noop write)") {
        graft.pipeline.QualityPipeline.annotate(pages)
          .write.format("noop").mode("overwrite").save()
      }
      t("annotate+parquet flat") {
        graft.pipeline.QualityPipeline.annotate(pages)
          .write.mode("overwrite").parquet("/tmp/stagetime_flat")
      }
      t("annotate+salt+parquet") {
        graft.pipeline.QualityPipeline.run(pages, "/tmp/stagetime_out")
      }
    }
    spark.stop()
  }
}
