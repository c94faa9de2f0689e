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

  test("checkpoint recovery: killed stream restarted from the same checkpoint " +
      "≡ one uninterrupted run (exactly-once output, no dup/loss)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_stream_recover").toString
    val all = SynthPages.pages(spark, 300L)
    // first wave lands, stream processes it, then is STOPPED (the kill)
    all.filter(_.url.hashCode % 2 == 0).write.parquet(s"$base/landing")
    val q1 = StreamOps.annotateStream(spark, s"$base/landing",
      s"$base/out", s"$base/ckpt")
    q1.processAllAvailable()
    q1.stop()
    // second wave lands while the stream is down
    all.filter(_.url.hashCode % 2 != 0).write.mode("append")
      .parquet(s"$base/landing")
    // restart from the SAME checkpointLocation — must resume, not reprocess
    val q2 = StreamOps.annotateStream(spark, s"$base/landing",
      s"$base/out", s"$base/ckpt")
    q2.processAllAvailable()
    q2.stop()
    val recovered = spark.read.parquet(s"$base/out")
      .select("url", "keep").as[(String, Boolean)].collect()
    // exactly once: every url exactly once, decisions ≡ uninterrupted batch
    assert(recovered.length == 300, s"${recovered.length} rows ≠ 300")
    assert(recovered.map(_._1).distinct.length == 300,
      "duplicate urls — first wave reprocessed after restart")
    val batch = graft.pipeline.QualityPipeline.annotate(all)
      .collect().map(a => a.url -> a.keep).toMap
    assert(recovered.toMap == batch)
  }

  test("streaming decontamination ≡ batch decontaminate, across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_sdecon").toString
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma other words here",
      3L -> "totally clean document nothing shared",
      4L -> "one two three four five six",
      5L -> "short").toDF("doc_id", "text")
    val bench = Seq(
      100L -> "alpha beta gamma delta epsilon",
      101L -> "one two three four").toDF("doc_id", "text")
    docs.repartition(3).write.parquet(s"$base/landing") // several files →
    // maxFilesPerTrigger drives multiple micro-batches
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/landing")
    val q = StreamOps.decontaminateStream(stream, bench, "text",
        n = 3, minHits = 2)
      .writeStream.format("memory").queryName("sdecon")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sdecon")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.dedup.Decontaminate.decontaminate(
        docs, bench, "doc_id", "text", n = 3, minHits = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed == Set(2L, 3L, 5L)) // 1 and 4 share ≥2 eval grams
  }

  test("streaming dedup keeps one row per content digest (bounded state)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_sdedup").toString
    val pages = SynthPages.pages(spark, 200L).toDF()
    // plant exact duplicates under different urls
    pages.unionByName(pages.withColumn("url", concat(col("url"), lit("-dup"))))
      .write.parquet(s"$base/landing")
    val stream = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(s"$base/landing")
    val q = StreamOps.dedupStream(stream, "1 hour")
      .writeStream.format("memory").queryName("sdedup")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sdedup").select("text").as[String].collect()
    val distinctTexts = pages.select("text").distinct().count()
    assert(out.length.toLong == distinctTexts,
      s"${out.length} rows vs $distinctTexts distinct texts")
    assert(out.toSet.size == out.length, "duplicate text survived dedup")
  }

  test("streaming minhash near-dup ≡ batch pair set, state carries across " +
      "micro-batches, exact dups verify at est_jaccard 1.0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_sneardup").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def docs(rows: (Long, String)*) =
      rows.toDF("doc_id", "text").withColumn("ts", lit(t0))
    val g1 = "unu doi trei patru cinci șase șapte opt nouă zece " * 5
    val g2 = "cu totul alte cuvinte despre altceva complet diferit aici " * 5
    val solo = "text unic fără nicio pereche în corpus " * 5
    // wave 1: one doc of each group; wave 2 (separate micro-batch): the
    // duplicates — pairs MUST come from bucket state, not the same batch
    val wave1 = docs(1L -> g1, 2L -> g2, 3L -> solo)
    val wave2 = docs(11L -> g1, 12L -> g2)
    wave1.write.parquet(s"$base/landing")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .parquet(s"$base/landing")
    val q = StreamOps.nearDupStream(stream, "doc_id", "text", "ts",
        minEstJaccard = 0.9)
      .writeStream.format("memory").queryName("sneardup")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("sneardup").isEmpty, "no dups landed yet")
    wave2.write.mode("append").parquet(s"$base/landing")
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("sneardup").as[StreamOps.NearDupHit].collect()
    val streamPairs = hits.map(h => (h.id_a, h.id_b)).toSet
    val batchPairs = graft.dedup.Dedup.minhashNearDups(
        wave1.unionByName(wave2), "doc_id", "text", minJaccard = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs == batchPairs,
      s"stream $streamPairs ≠ batch $batchPairs")
    assert(streamPairs == Set((1L, 11L), (2L, 12L)))
    assert(hits.forall(_.est_jaccard == 1.0),
      s"exact dup estimated below 1.0: ${hits.toSeq}")
  }

  test("late rows far below the watermark don't kill the stream (timeout " +
      "clamp) and still pair — batch-recall semantics for late data") {
    // flatMapGroupsWithState does NOT pre-filter late input: a bucket fed
    // ONLY by rows older than watermark − lateness used to compute a
    // timeout in the past and fail the whole query
    // ([FLATMAPGROUPSWITHSTATE_USER_FUNCTION_ERROR] ... cannot be earlier
    // than the current watermark — first hit by the DedupScale
    // state-bound phase replaying shuffled file order). The clamp expires
    // such buckets at the earliest legal instant instead.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_latebkt").toString
    def docs(ts: String, rows: (Long, String)*) =
      rows.toDF("doc_id", "text")
        .withColumn("ts", lit(java.sql.Timestamp.valueOf(ts)))
    val g1 = "unu doi trei patru cinci șase șapte opt nouă zece " * 5
    val old = "cuvinte sosite târziu din altă zi cu totul " * 5
    // BOTH files land before the stream starts and maxFilesPerTrigger=1,
    // so the two batches run back-to-back with NO no-data batch between:
    // batch 1's late-events filter then still carries batch 0's watermark
    // (unset — the late filter lags one batch, SPARK-39931) while its
    // EVICTION watermark has advanced to 09:00 — exactly the out-of-order
    // replay shape. The 01:00 exact-dup pair passes the late filter, and
    // its bucket's natural timeout (02:00) is below the eviction
    // watermark; pre-clamp, setTimeoutTimestamp threw and killed the
    // whole query. coalesce(1): both late rows must share the ONE file =
    // one batch (split across batches, the second would fall to the
    // caught-up late filter and the pair could never form).
    docs("2026-01-01 10:00:00", 1L -> g1).coalesce(1)
      .write.parquet(s"$base/landing")
    Thread.sleep(50) // distinct mtimes: the source replays oldest-first
    docs("2026-01-01 01:00:00", 20L -> old, 21L -> old).coalesce(1)
      .write.mode("append").parquet(s"$base/landing")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/landing")
    val q = StreamOps.nearDupStream(stream, "doc_id", "text", "ts",
        minEstJaccard = 0.9, lateness = "1 hour")
      .writeStream.format("memory").queryName("latebkt")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(q.exception.isEmpty,
      s"late bucket killed the stream: ${q.exception}")
    val pairs = spark.table("latebkt").as[StreamOps.NearDupHit].collect()
      .map(h => (h.id_a, h.id_b)).toSet
    assert(pairs == Set((20L, 21L)),
      s"late exact dups must still pair: $pairs")
  }

  test("streaming hits ∘ batch re-verify ≡ batch exact pairs: the estimate " +
      "path composes back to exactness through Dedup.reverifyPairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_sreverify").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def docs(rows: (Long, String)*) =
      rows.toDF("doc_id", "text").withColumn("ts", lit(t0))
    // an exact-dup pair, a NEAR-dup pair (middle token replaced → 3 of 38
    // 3-gram shingles change: J = 35/41 ≈ 0.854, above the 0.8 batch bar
    // but below 1.0, so the estimate genuinely differs from the exact
    // value), and an unrelated solo
    val tA = (1 to 40).map(i => s"cuv$i").mkString(" ")
    val tAnear = (1 to 40).map(i => if (i == 20) "alt20" else s"cuv$i")
      .mkString(" ")
    val tB = (1 to 30).map(i => s"alte$i").mkString(" ")
    val solo = (1 to 30).map(i => s"unic$i").mkString(" ")
    val wave1 = docs(1L -> tA, 3L -> tB, 5L -> solo)
    val wave2 = docs(2L -> tAnear, 4L -> tB)
    wave1.write.parquet(s"$base/landing")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .parquet(s"$base/landing")
    // stream at a LOWER estimate threshold (0.5) than the batch target
    // (0.8): the estimate's se ≈ 0.07 at J = 0.8, so the lowered bar makes
    // the hit set a superset of the exact answer; re-verify tightens it
    val q = StreamOps.nearDupStream(stream, "doc_id", "text", "ts",
        minEstJaccard = 0.5)
      .writeStream.format("memory").queryName("sreverify")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    wave2.write.mode("append").parquet(s"$base/landing")
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("sreverify")
    assert(hits.count() > 0, "stream produced no candidate hits")
    val corpus = wave1.unionByName(wave2)
    val reverified = graft.dedup.Dedup.reverifyPairs(
        hits.toDF(), corpus, "doc_id", "text", minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.dedup.Dedup.minhashNearDups(
        corpus, "doc_id", "text", minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(reverified == batch,
      s"stream∘reverify $reverified ≠ batch $batch")
    assert(reverified.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L)))
    // the near pair carries the EXACT jaccard (35/41), not the estimate
    val nearJ = reverified.find(p => (p._1, p._2) == (1L, 2L)).get._3
    assert(nearJ == math.rint(35.0 / 41 * 1e6) / 1e6, s"nearJ=$nearJ")
  }

  test("streaming near-dup bucket state is FIFO-capped, planted cluster " +
      "stays connected") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_sneardup_cap").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val tpl = "același șablon de pagină repetat la nesfârșit pe site " * 5
    // 40 identical docs into the same buckets with bucketCap=8: state
    // stays bounded; each arrival still pairs with the retained window
    (1L to 40L).map(i => (i, tpl)).toDF("doc_id", "text")
      .withColumn("ts", lit(t0)).write.parquet(s"$base/landing")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .parquet(s"$base/landing")
    val q = StreamOps.nearDupStream(stream, "doc_id", "text", "ts",
        minEstJaccard = 0.9, bucketCap = 8)
      .writeStream.format("memory").queryName("sneardup_cap")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("sneardup_cap")
      .select("id_a", "id_b").distinct()
      .as[(Long, Long)].collect().toSet
    // rows reach a bucket in shuffle order, not id order, so the pinned
    // guarantee is the batch mega-bucket one: every arrival pairs with at
    // least its most recent predecessor in the window, so the planted
    // cluster stays CONNECTED (and far from all-pairs) under the cap
    assert(pairs.size < 40 * 39 / 2, "cap did not bound the expansion")
    val parent = scala.collection.mutable.Map((1L to 40L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val roots = (1L to 40L).map(find).toSet
    assert(roots.size == 1,
      s"planted duplicate cluster split into ${roots.size} components")
  }

  test("mapGroupsWithState host snapshots: batch ≡ groupBy, stream accumulates") {
    import spark.implicits._
    val annotated = graft.pipeline.QualityPipeline
      .annotate(SynthPages.pages(spark, 300L))
    // batch mode: one state pass per group ≡ a plain aggregation
    val snap = StreamOps.hostQualityState(annotated)
      .collect().map(s => s.host -> s).toMap
    val expect = annotated.collect()
      .groupBy(a => new java.net.URI(a.url).getHost)
    assert(snap.keySet == expect.keySet)
    expect.foreach { case (h, rows) =>
      assert(snap(h).docs == rows.length)
      assert(snap(h).kept == rows.count(_.keep))
      assert(math.abs(snap(h).mean_ppl - rows.map(_.ppl).sum / rows.length) < 1e-9)
    }

    // streaming: state carries across micro-batches
    val base = Files.createTempDirectory("graft_state").toString
    SynthPages.pages(spark, 150L).write.parquet(s"$base/landing")
    val stream = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(s"$base/landing").as[graft.model.Page]
    val q = StreamOps.hostQualityState(
        graft.pipeline.QualityPipeline.annotate(stream))
      .writeStream.format("memory").queryName("hoststate")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update").start()
    q.processAllAvailable()
    // second micro-batch: 150 MORE docs (ids 150..299 of the same corpus)
    SynthPages.pages(spark, 300L).filter(_.url.split("/").last.toLong >= 150)
      .write.mode("append").parquet(s"$base/landing")
    q.processAllAvailable()
    q.stop()
    // latest snapshot per host must equal the batch totals over all 300
    val latest = spark.table("hoststate").as[StreamOps.HostSnapshot]
      .collect().groupBy(_.host).map { case (h, xs) => h -> xs.maxBy(_.docs) }
    val full = graft.pipeline.QualityPipeline
      .annotate(SynthPages.pages(spark, 300L)).collect()
      .groupBy(a => new java.net.URI(a.url).getHost)
    full.foreach { case (h, rows) =>
      assert(latest(h).docs == rows.length, s"host $h")
      assert(latest(h).kept == rows.count(_.keep), s"host $h")
    }
  }

  test("hostOf is total: malformed and scheme-less URLs never throw") {
    assert(StreamOps.hostOf("https://site3.example.ro/pagina/7") ==
      "site3.example.ro")
    assert(StreamOps.hostOf("http://ex ample.com/a") == "ex ample.com")
    assert(StreamOps.hostOf("example.com/x") == "example.com")
    assert(StreamOps.hostOf("") == "unknown")
    assert(StreamOps.hostOf(null) == "unknown")
    assert(StreamOps.hostOf("http:///nohost") == "unknown")
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
