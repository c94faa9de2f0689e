package graft.lineage

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.SynthPages

/** C1 resume semantics (FIXTURES.md `resume` family): kill after K waves,
  * restart, no double-processing, final output == single-run output.
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("killed run resumes at partition granularity; output equals single run") {
    val base = Files.createTempDirectory("graft_lineage").toString
    val pages = SynthPages.pages(spark, 1200L)

    // single uninterrupted run = golden output
    ResumableRunner.run(pages, s"$base/golden", s"$base/lin_golden", "golden",
      numChunks = 8, waveSize = 2)

    // killed run: fails after 1 wave (2 of 8 chunks)
    intercept[SimulatedFailure] {
      ResumableRunner.run(pages, s"$base/out", s"$base/lin", "run1",
        numChunks = 8, waveSize = 2, failAfterWaves = Some(1))
    }
    val store = new LineageStore(spark, s"$base/lin")
    val afterKill = store.completedChunks("run1")
    assert(afterKill.size == 2, s"expected 2 completed chunks, got $afterKill")

    // resume: must process exactly the remaining 6, never the completed 2
    val resumed = ResumableRunner.run(pages, s"$base/out", s"$base/lin", "run1",
      numChunks = 8, waveSize = 2)
    assert(resumed.size == 6)
    assert(resumed.toSet.intersect(afterKill).isEmpty, "chunk double-processed")
    assert(store.completedChunks("run1") == (0 until 8).toSet)

    // lineage rows: one per chunk, no duplicates
    val rows = store.all().collect().filter(_.run_id == "run1")
    assert(rows.length == 8)
    assert(rows.map(_.chunk_id).distinct.length == 8)
    assert(rows.map(_.docs_in).sum == 1200L)

    // final output byte-equals the uninterrupted golden run
    import org.apache.spark.sql.functions.col
    val out = spark.read.parquet(s"$base/out").drop("chunk_id")
      .orderBy(col("url")).collect()
    val golden = spark.read.parquet(s"$base/golden").drop("chunk_id")
      .orderBy(col("url")).collect()
    assert(out.length == 1200 && out.sameElements(golden))
  }

  test("each wave scores ONLY its own chunks (no per-wave full-corpus rescan)") {
    val base = Files.createTempDirectory("graft_lineage3").toString
    val nDocs = 800L
    val pages = SynthPages.pages(spark, nDocs)

    // full run over 4 waves: every doc must be scored exactly once in total —
    // the old shape (annotate before the chunk filter) scored nDocs × waves
    val m1 = new graft.pipeline.PipelineMetrics(spark)
    ResumableRunner.run(pages, s"$base/out", s"$base/lin", "scan1",
      numChunks = 8, waveSize = 2, metrics = Some(m1))
    assert(m1.docsIn.value == nDocs,
      s"scored ${m1.docsIn.value} docs across waves, expected $nDocs (one pass)")

    // resume after 1 completed wave: only the REMAINING chunks' docs are
    // scored, not the whole corpus again
    val base2 = Files.createTempDirectory("graft_lineage4").toString
    intercept[SimulatedFailure] {
      ResumableRunner.run(pages, s"$base2/out", s"$base2/lin", "scan2",
        numChunks = 8, waveSize = 2, failAfterWaves = Some(1))
    }
    val store = new LineageStore(spark, s"$base2/lin")
    val doneDocs = store.all().collect()
      .filter(_.run_id == "scan2").map(_.docs_in).sum
    val m2 = new graft.pipeline.PipelineMetrics(spark)
    ResumableRunner.run(pages, s"$base2/out", s"$base2/lin", "scan2",
      numChunks = 8, waveSize = 2, metrics = Some(m2))
    assert(m2.docsIn.value == nDocs - doneDocs,
      s"resume scored ${m2.docsIn.value}, expected ${nDocs - doneDocs}")
  }

  test("metrics in lineage match the pipeline decisions") {
    val base = Files.createTempDirectory("graft_lineage2").toString
    val pages = SynthPages.pages(spark, 600L)
    ResumableRunner.run(pages, s"$base/out", s"$base/lin", "m1",
      numChunks = 4, waveSize = 4)
    val store = new LineageStore(spark, s"$base/lin")
    val rows = store.all().collect()
    val keptTotal = rows.map(_.docs_kept).sum
    val expected = graft.pipeline.QualityPipeline
      .annotate(pages).filter(_.keep).count()
    assert(keptTotal == expected)
  }
}
