package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only smoke runner: flagship entry + a few stats printed. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.show(50, truncate = false)
    // family vs decision sanity
    import spark.implicits._
    import graft.synth.SynthPages
    val ann = graft.pipeline.QualityPipeline.annotate(SynthPages.pages(spark, 3000))
    val withFam = ann.map(a => {
      val id = a.url.substring(a.url.lastIndexOf('/') + 1).toLong
      (SynthPages.familyOf(42L, id), a.keep, a.lang_pred, a.ppl, a.n_cnps, a.n_emails, a.n_slurs)
    }).toDF("family", "keep", "lang_pred", "ppl", "n_cnps", "n_emails", "n_slurs")
    withFam.groupBy("family", "keep").count().orderBy("family", "keep").show(40)
    withFam.groupBy("family").avg("ppl").orderBy("family").show()
    withFam.agg(org.apache.spark.sql.functions.sum("n_cnps"),
      org.apache.spark.sql.functions.sum("n_emails"),
      org.apache.spark.sql.functions.sum("n_slurs")).show()
    spark.stop()
  }
}
