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

  test("crawl-snapshot labels are ISO-consistent at year boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ISO facts: 2024-12-31 (Tue) is week 1 of week-year 2025;
    // 2027-01-01 (Fri) is week 53 of week-year 2026; 2025-01-01 (Wed) is
    // week 1 of 2025. The calendar-year pairing would emit the impossible
    // labels 2024-01 and 2027-53.
    val rows = Seq("2024-12-31 12:00:00", "2025-01-01 12:00:00",
      "2026-12-28 12:00:00", "2027-01-01 12:00:00")
      .map(java.sql.Timestamp.valueOf)
      .toDF("warc_ts")
    val got = rows
      .select(QualityPipeline.snapshotCol(col("warc_ts")).as("snap"))
      .collect().map(_.getString(0))
    assert(got.sameElements(Array(
      "CC-MAIN-2025-01", "CC-MAIN-2025-01",
      "CC-MAIN-2026-53", "CC-MAIN-2026-53")), got.toSeq.toString)
  }
}
