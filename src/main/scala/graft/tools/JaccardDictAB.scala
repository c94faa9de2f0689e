package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused A/B for the freq-order jaccard DICTIONARY sub-pipeline (r6):
  * document-frequency per token attached to every (grp, id, tok) row and
  * re-grouped to rare-first ordered sets — the stage between tokenize and
  * the prefix-candidate join of `Dedup.jaccardPrefixJoin(freqOrder=true)`.
  *
  *  A (r5 shape): `dfreq = tok.groupBy(tok).count` then a merge self-join
  *    `tok ⋈ dfreq` — partial-aggregated dictionary, but the exploded
  *    token frame is exchanged TWICE (aggregate + join probe).
  *  B (r6 candidate): `count(*) OVER (PARTITION BY tok)` — one exchange
  *    of the token frame, no join, but the window buffers each token
  *    group and cannot be AQE-skew-split.
  *
  * Both end in the identical (grp, id) re-group; interleaved rounds to a
  * noop sink separate host throttle from the real difference. Usage:
  * `runMain graft.tools.JaccardDictAB [nDocs] [rounds]`.
  */
object JaccardDictAB {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 800000L
    val rounds = if (args.length > 1) args(1).toInt else 3
    val shufflePartitions = math.max(64L, nDocs / 50000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = graft.analytics.Materialize(
      graft.synth.ScaleCorpus.docs(spark, nDocs, partitions = 128).toDF())
    val slice = corpus
      .filter(col("cluster") === -1L || col("cluster") >= 2000L)
      .withColumn("grp", lit("all"))
    val base = graft.analytics.Materialize(
      slice.select(col("grp"), col("doc_id").as("id"),
        array_distinct(split(col("text"), " ")).as("toks")))
    println(s"slice docs: ${base.count()}")

    def regrouped(tokWithDf: org.apache.spark.sql.DataFrame) =
      tokWithDf.groupBy("grp", "id")
        .agg(transform(
          array_sort(collect_set(struct(col("df"), col("tok")))),
          s => s.getField("tok")).as("sh"))

    def runA(): Unit = {
      val tok = base.select(col("grp"), col("id"),
        explode(col("toks")).as("tok"))
      val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      regrouped(tok.join(dfreq.hint("merge"), "tok"))
        .write.format("noop").mode("overwrite").save()
    }
    def runB(): Unit = {
      val tok = base.select(col("grp"), col("id"),
        explode(col("toks")).as("tok"))
      val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
      regrouped(tok.withColumn("df", count(lit(1)).over(wTok)))
        .write.format("noop").mode("overwrite").save()
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    runA(); runB() // warmup both
    for (r <- 1 to rounds) {
      val a = time(runA)
      val b = time(runB)
      println(f"round $r: A(agg+join) $a%.1f s   B(window) $b%.1f s")
    }
    spark.stop()
  }
}
