package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans + quick pipeline timing. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ann = graft.pipeline.QualityPipeline.annotate(
      graft.synth.SynthPages.pages(spark, 1000L))
    println("=== PIPELINE PLAN ===")
    ann.explain("formatted")

    println("=== q_p1 PLAN (pushdown check) ===")
    graft.analytics.Queries.all("q_p1_projection")(spark, "/root/testdata/sf0.01")
      .explain("formatted")

    // timing: docs/sec on annotate+write
    val n = 200000L
    val t0 = System.nanoTime()
    graft.pipeline.QualityPipeline.run(
      graft.synth.SynthPages.pages(spark, n, partitions = 64),
      "/tmp/bench_pipe_out")
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"=== pipeline: $n docs in $sec%.1f s = ${n / sec}%.0f docs/sec ===")
    spark.stop()
  }
}
