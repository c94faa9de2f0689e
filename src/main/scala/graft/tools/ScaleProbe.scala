package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe pipeline scaling at several core counts in one JVM. */
object ScaleProbe {
  def sess(c: Int, aqe: Boolean): SparkSession = {
    val s = SparkSession.builder().master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", c)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN"); s
  }
  def run(spark: SparkSession, docs: Long, out: String): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    // full pipeline incl. the salted repartition shuffle; noop sink so the
    // sandbox's cgroup-throttled disk (~56 MB/s buffered) doesn't dominate
    graft.pipeline.QualityPipeline.annotate(
        graft.synth.SynthPages.pages(spark, docs, partitions = 64))
      .repartition(32, col("crawl_snapshot"),
        pmod(xxhash64(col("url")), lit(32)))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    println("maxHeap=" + Runtime.getRuntime.maxMemory / (1 << 20) + "MB")
    val docs = if (args.nonEmpty) args(0).toLong else 200000L
    val cores = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(24, 6, 24, 6)
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    for (c <- cores) {
      val s = sess(c, aqe = true)
      run(s, 20000L, s"/tmp/probe_warm_$c") // warm
      val g0 = gcMs
      val sec = run(s, docs, s"/tmp/probe_$c")
      println(f"cores=$c: $sec%.1f s  ${docs / sec}%.0f docs/sec  gc=${(gcMs - g0) / 1000.0}%.1f s")
      s.stop()
    }
  }
}
