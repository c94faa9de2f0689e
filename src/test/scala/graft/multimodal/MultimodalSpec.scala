package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.SynthPages

/** Multimodal plumbing: mime sniffing (real), metadata columns, batched
  * feature extraction (stub codec, real batch/schema/partitioning).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("magic-byte mime sniffing classifies known prefixes") {
    import spark.implicits._
    val rows = Seq(
      Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte),
      Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte),
      "<html><body>x</body></html>".getBytes("UTF-8"),
      Array(0x00, 0x01).map(_.toByte)
    ).toDF("payload")
    val mimes = Multimodal.withMediaMeta(rows, "payload")
      .select("mime").collect().map(_.getString(0))
    assert(mimes.sameElements(Array("image/jpeg", "image/png", "text/html",
      "application/octet-stream")))
  }

  test("media metadata columns are exact") {
    import spark.implicits._
    val payload = "<html>abc</html>".getBytes("UTF-8")
    val r = Multimodal.withMediaMeta(Seq(payload).toDF("payload"), "payload")
      .select("n_bytes", "mime").head()
    assert(r.getLong(0) == payload.length.toLong)
    assert(r.getString(1) == "text/html")
  }

  test("batched feature extraction: stable schema, deterministic features") {
    import spark.implicits._
    val pages = SynthPages.pages(spark, 100L)
    val feats = Multimodal.extractFeatures(pages.map(p => (p.url, p.html)),
      dim = 16)
    val df = feats.toDF()
    assert(df.schema.fieldNames.sameElements(
      Array("url", "mime", "n_bytes", "features")))
    val rows = df.orderBy("url").collect()
    assert(rows.length == 100)
    assert(rows.forall(_.getSeq[Float](3).length == 16))
    assert(rows.forall(_.getString(1) == "text/html"))
    // determinism across partition counts
    val again = Multimodal.extractFeatures(
      SynthPages.pages(spark, 100L, partitions = 7).map(p => (p.url, p.html)),
      dim = 16).toDF().orderBy("url").collect()
    assert(rows.map(_.getSeq[Float](3).toList).toList ==
      again.map(_.getSeq[Float](3).toList).toList)
  }

  test("stub decoder is a pure function of payload bytes") {
    val p = "abc".getBytes
    val f1 = Multimodal.stubDecodeFeatures(p, 8)
    val f2 = Multimodal.stubDecodeFeatures("abc".getBytes, 8)
    assert(f1.sameElements(f2))
    assert(!f1.sameElements(Multimodal.stubDecodeFeatures("abd".getBytes, 8)))
  }
}
