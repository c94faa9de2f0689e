package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.SynthPages

/** Streaming pipeline: same scoring code as batch, micro-batch execution. */
class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming annotate produces the same decisions as batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_stream").toString
    val pages = SynthPages.pages(spark, 400L)
    pages.write.parquet(s"$base/landing")

    val q = StreamOps.annotateStream(spark, s"$base/landing",
      s"$base/out", s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(s"$base/out")
      .select("url", "keep").as[(String, Boolean)].collect().toMap
    val batch = graft.pipeline.QualityPipeline.annotate(pages)
      .collect().map(a => a.url -> a.keep).toMap
    assert(streamed.size == 400)
    assert(streamed == batch)
  }

  test("windowed keep counts with watermark aggregate by event time") {
    val annotated = graft.pipeline.QualityPipeline
      .annotate(SynthPages.pages(spark, 300L)).toDF()
    val counts = StreamOps.windowedKeepCounts(annotated, "24 hours", "1 hour")
      .collect()
    assert(counts.map(_.getAs[Long]("n_docs")).sum == 300L)
    assert(counts.forall(_.getAs[java.sql.Timestamp]("window_start") != null))
  }
}
