package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared materialization policy: conf parsing and failure modes.
  * (The reliable path writing real checkpoint files is covered end-to-end
  * in DedupSpec's "reliable-materialization conf" case.)
  */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def anyFile(p: java.io.File): Boolean =
    p.isFile || Option(p.listFiles).exists(_.exists(anyFile))

  test("reliable conf is case-insensitive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mat-ci").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.ReliableConfKey, "True")
    try {
      val out = Materialize(Seq(1, 2, 3).toDF("x"))
      assert(out.count() == 3)
      assert(anyFile(new java.io.File(dir)),
        "conf value 'True' fell back to localCheckpoint (no files written)")
    } finally spark.conf.unset(Materialize.ReliableConfKey)
  }

  test("reliable conf without a checkpoint dir fails loudly, not silently " +
      "non-fault-tolerant") {
    import spark.implicits._
    // the checkpoint dir is per-CONTEXT (shared by all sessions and
    // suites) — clear it for this test and restore after, so the case is
    // deterministic regardless of suite order
    val sc = spark.sparkContext
    val saved = sc.getCheckpointDir
    val setter = sc.getClass.getMethods
      .find(_.getName == "checkpointDir_$eq").get
    setter.invoke(sc, None)
    spark.conf.set(Materialize.ReliableConfKey, "true")
    try {
      val e = intercept[IllegalStateException](Materialize(Seq(1).toDF("x")))
      assert(e.getMessage.contains("checkpoint directory"))
    } finally {
      spark.conf.unset(Materialize.ReliableConfKey)
      saved.foreach(sc.setCheckpointDir)
    }
  }

  test("default path is the in-memory localCheckpoint (no files written)") {
    import spark.implicits._
    assert(spark.conf.getOption(Materialize.ReliableConfKey).isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-mat-def").toString
    spark.sparkContext.setCheckpointDir(dir)
    val out = Materialize(Seq(1, 2).toDF("x"))
    assert(out.count() == 2)
    assert(!anyFile(new java.io.File(dir)),
      "default Materialize wrote reliable checkpoint files")
  }
}
