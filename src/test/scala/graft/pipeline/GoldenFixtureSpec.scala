package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.SynthPages

/** Pins keep/drop + scrubbed-text bytes against the COMMITTED golden file
  * (generated once by `graft.tools.GoldenGen`). Catches accidental semantic
  * drift across refactors and rounds — an intentional semantics change must
  * regenerate the fixture explicitly.
  */
class GoldenFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pipeline decisions match the committed golden fixture exactly") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_decisions.csv"), "UTF-8")
    val golden = try {
      src.getLines().drop(1).map { line =>
        val Array(url, keep, md5) = line.split(",", 3)
        url -> ((keep.toBoolean, md5))
      }.toMap
    } finally src.close()
    assert(golden.size == 2000)

    val got = QualityPipeline.annotate(SynthPages.pages(spark, 2000L))
      .collect().map { a =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(a.scrubbed_text.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        a.url -> ((a.keep, md5))
      }.toMap
    assert(got.size == 2000)
    var mismatches = 0
    golden.foreach { case (url, exp) =>
      if (got(url) != exp) mismatches += 1
    }
    assert(mismatches == 0, s"$mismatches rows diverge from the golden fixture")
  }
}
