package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Distributed global row numbering ≡ the naive single-partition window. */
class AlignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("withGlobalRowNumber equals the unpartitioned window, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 5000)
      .map(i => ((i * 2654435761L) % 100003L, s"v$i"))
      .toDF("k", "v")
    val naive = df.withColumn("rn",
        row_number().over(Window.orderBy("k")).cast("long"))
      .select("k", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = Align.withGlobalRowNumber(df.repartition(7), Seq(col("k")),
          "rn", numPartitions = parts)
        .select("k", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == naive.size)
      assert(got == naive, s"numbering diverges at numPartitions=$parts")
    }
  }

  test("withGlobalRowNumber under the reliable-materialization conf " +
      "matches the in-memory path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-align-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Materialize.ReliableConfKey, "true")
    try {
      val df = (0 until 2000)
        .map(i => ((i * 40503L) % 65521L, s"v$i")).toDF("k", "v")
      val got = Align.withGlobalRowNumber(df.repartition(5), Seq(col("k")),
          "rn", numPartitions = 8)
        .select("k", "rn").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val expect = df.orderBy("k").collect().map(_.getLong(0))
        .zipWithIndex.map { case (k, i) => k -> (i + 1).toLong }.toMap
      assert(got == expect)
    } finally spark.conf.unset(Materialize.ReliableConfKey)
  }

  test("numbering is contiguous 1..n and no stage sees all rows") {
    import spark.implicits._
    val ks: Seq[Int] = (1 to 997).map(i => i * 13)
    val df = ks.toDF("k")
    val out = Align.withGlobalRowNumber(df, Seq(col("k")), "rn",
      numPartitions = 8)
    val rns = out.select("rn").collect().map(_.getLong(0)).sorted
    val expect: Array[Long] = Array.tabulate(997)(i => (i + 1).toLong)
    assert(rns.sameElements(expect))
    // plan evidence: no empty-partition-spec window (the single-task shape)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [row_number()") ||
      plan.contains("__pid"), "window must be keyed by partition id")
  }

  test("census and ranking read ONE materialized range exchange (plan shape)") {
    import spark.implicits._
    // The scale hazard: two independently-planned range exchanges can
    // sample different partition boundaries, so offsets computed against
    // one partitioning get added to ranks computed against another. The
    // fix materializes the ranged frame once (eager localCheckpoint); the
    // ranking plan must read the checkpointed RDD (Scan ExistingRDD) and
    // contain NO range exchange of its own — the one boundary sample
    // happened before the checkpoint and is frozen in the blocks — with
    // the offsets coming from a driver-computed LocalTableScan broadcast.
    val df = (0 until 2000).map(i => ((i * 48271) % 65537, i)).toDF("k", "v")
    val out = Align.withGlobalRowNumber(df, Seq(col("k")), "rn",
      numPartitions = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      "ranked side must read the one materialized range partitioning")
    assert(!plan.contains("REPARTITION_BY_NUM") &&
      !plan.contains("rangepartitioning"),
      "an independently-sampled range exchange appears in the numbering " +
        "plan — census and ranking may see different boundaries")
    assert(plan.contains("LocalTableScan"),
      "offsets must be the driver-computed manifest, not a re-aggregation")
  }

  test("alignByRowNumber pairs two streams positionally") {
    import spark.implicits._
    val a = Seq((10, "a1"), (20, "a2"), (30, "a3")).toDF("k", "va")
    val b = Seq((5, "b1"), (25, "b2"), (45, "b3"), (65, "b4")).toDF("k", "vb")
    val out = Align.alignByRowNumber(a.select("k", "va"),
        b.select(col("k"), col("vb")).drop("va"), Seq(col("k")))
      .select("rn", "va", "vb").orderBy("rn").collect()
    assert(out.length == 3) // inner join on rn: min(|a|,|b|)
    assert(out.map(_.getString(1)).sameElements(Array("a1", "a2", "a3")))
    assert(out.map(_.getString(2)).sameElements(Array("b1", "b2", "b3")))
  }

  test("withGlobalRowNumberByTag ≡ per-tag withGlobalRowNumber (r6 one-pass)") {
    import spark.implicits._
    // 3 tags, interleaved keys, skewed tag sizes, a tag missing from some
    // key ranges — the numbering must equal numbering each tag's slice
    // independently
    val df = (0 until 3000).map { i =>
      val tag = if (i % 7 == 0) "C" else if (i % 2 == 0) "A" else "B"
      (((i * 48271) % 65537).toLong, tag, i)
    }.toDF("k", "tag", "v")
    for (parts <- Seq(1, 4, 16)) {
      val got = Align.withGlobalRowNumberByTag(df, "tag", Seq(col("k")),
          "rn", numPartitions = parts)
        .select("tag", "k", "rn").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = Seq("A", "B", "C").flatMap { tg =>
        Align.withGlobalRowNumber(df.filter(col("tag") === tg),
            Seq(col("k")), "rn", numPartitions = parts)
          .select("k", "rn").collect()
          .map(r => (tg, r.getLong(0)) -> r.getLong(1))
      }.toMap
      assert(got == want, s"tagged numbering diverges at parts=$parts")
    }
  }

  test("withGlobalRowNumberByTag plans ONE materialized range exchange " +
      "and a driver-manifest offsets join") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, if (i % 2 == 0) "x" else "y"))
      .toDF("k", "tag")
    val out = Align.withGlobalRowNumberByTag(df, "tag", Seq(col("k")), "rn",
      numPartitions = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      "ranked side must read the one materialized range partitioning")
    assert(!plan.contains("rangepartitioning"),
      "numbering plan must not re-sample a range exchange")
    assert(plan.contains("LocalTableScan"),
      "offsets must be the driver-computed manifest")
  }
}
