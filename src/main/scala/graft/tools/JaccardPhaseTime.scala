package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the DEDUP_SCALE jaccard_prefix_freq phase body in isolation
  * (same corpus, slice, parameters) — used to attribute r6's positional-
  * filter effect without a full 14-phase run.
  * Usage: `runMain graft.tools.JaccardPhaseTime [nDocs] [rounds]`.
  */
object JaccardPhaseTime {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", math.max(64L, nDocs / 50000L))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.analytics.Materialize(
      graft.synth.ScaleCorpus.docs(spark, nDocs, partitions = 128).toDF())
    val slice = corpus.filter(col("cluster") === -1L ||
        col("cluster") >= 2000L)
      .withColumn("grp", lit("all"))
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val out = graft.analytics.Materialize(
        graft.dedup.Dedup.jaccardPrefixJoin(slice, "doc_id", "text", "grp",
          0.8, freqOrder = true, assumeUniqueIds = true))
      val n = out.count()
      println(f"round $r: jaccard_prefix_freq ${(System.nanoTime() - t0) / 1e9}%.1f s, exact_pairs=$n")
    }
    spark.stop()
  }
}
