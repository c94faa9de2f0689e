package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.synth.ScaleCorpus

/** DEDUP_SCALE evidence run: the dedup/similarity family executed end-to-end
  * on a 10^6-scale synthetic corpus with planted zipf skew
  * ([[graft.synth.ScaleCorpus]]) — the volume the sf0.1 driver fixtures
  * (~7k rows) never reach. Emits `DEDUP_SCALE.json` at the repo root with
  * per-phase wall times, shuffle-write telemetry (total + peak stage),
  * census counts, CC iterations, recovery rates, and the AQE skew-join plan
  * excerpt. Run: `sbt "runMain graft.tools.DedupScale [nDocs]"`.
  *
  * Everything heavy stays on /dev/shm (the sandbox disk is cgroup-throttled
  * to ~56 MB/s — it would measure the disk, not the engine); a cluster
  * writes to distributed storage instead.
  */
object DedupScale {

  /** Aggregates shuffle-write bytes per completed stage. Listener events
    * are delivered asynchronously; phases sleep briefly before reading, so
    * the numbers are telemetry (±last stage), not a ledger.
    */
  private final class ShuffleTally extends SparkListener {
    val total = new java.util.concurrent.atomic.AtomicLong
    val peak = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      total.addAndGet(w)
      peak.accumulateAndGet(w, (a, b) => math.max(a, b))
    }
  }

  /** Σ C(k, 2) over clusters with ≥ 2 members in `m` (columns `cluster`,
    * one row per member) — the planted-pair denominator shared by the
    * simhash and embedding recovery oracles. Double arithmetic (Column `/`
    * divides in double; ANSI would throw on a long overflow).
    */
  private def plantedPairs(m: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.functions._
    m.groupBy("cluster").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)
      .agg(coalesce(sum(col("k") * (col("k") - 1) / 2), lit(0.0)))
      .head().getDouble(0).toLong
  }

  private def renderJson(v: Any): String = v match {
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
    case d: Double =>
      // Locale.ROOT: the f interpolator follows the default locale, and a
      // comma-decimal locale would emit invalid JSON
      String.format(java.util.Locale.ROOT,
        if (d == d.floor && d.abs < 1e15) "%.1f" else "%.4f",
        java.lang.Double.valueOf(d))
    case m: Seq[_] if m.nonEmpty && m.head.isInstanceOf[(_, _)] =>
      m.asInstanceOf[Seq[(String, Any)]]
        .map { case (k, x) => "\"" + k + "\":" + renderJson(x) }
        .mkString("{", ",", "}")
    case m: Seq[_] => m.map(renderJson).mkString("[", ",", "]")
    case other => other.toString
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val bucketCap = 512
    val minJ = 0.8
    val base = "/dev/shm/graft_scale"
    ToolFs.rmTree(new java.io.File(base))
    Files.createDirectories(Paths.get(base))

    // shuffle parallelism ∝ input (what a cluster deployment sizes by
    // data volume): 64 partitions carried 2M–5M docs, but at 10M the
    // per-partition SMJ sorts of shingle-array rows exhausted execution
    // memory across 32 concurrent tasks (observed SparkOutOfMemoryError);
    // ~50k docs per partition keeps each sort buffer modest and AQE
    // coalesces the small stages back down
    val shufflePartitions = math.max(64L, nDocs / 50000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val phases = scala.collection.mutable.ArrayBuffer.empty[(String, Any)]
    def phase(name: String)(body: => Seq[(String, Any)]): Unit = {
      sc.setJobDescription(s"dedup-scale:$name")
      val tally = new ShuffleTally
      sc.addSparkListener(tally)
      val t0 = System.nanoTime()
      val stats = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain (telemetry, not ledger)
      sc.removeSparkListener(tally)
      phases += name -> (Seq(
        "wall_sec" -> math.rint(sec * 100) / 100,
        "shuffle_write_mb" -> math.rint(tally.total.get / 1e6 * 10) / 10,
        "peak_stage_shuffle_mb" -> math.rint(tally.peak.get / 1e6 * 10) / 10
      ) ++ stats)
      System.err.println(f"[scale] $name done in $sec%.1f s " +
        f"(shuffle ${tally.total.get / 1e6}%.0f MB)")
    }

    // ---- corpus ----------------------------------------------------------
    var corpus: org.apache.spark.sql.DataFrame = null
    var topClusters: Array[(Long, Long)] = null
    phase("corpus_build") {
      corpus = graft.analytics.Materialize(
        ScaleCorpus.docs(spark, nDocs, partitions = 128).toDF())
      val n = corpus.count()
      topClusters = corpus.filter(col("cluster") >= 0)
        .groupBy("cluster").agg(count(lit(1)).as("sz"))
        .orderBy(col("sz").desc).limit(5)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nClustered = corpus.filter(col("cluster") >= 0).count()
      Seq("docs" -> n, "clustered_docs" -> nClustered,
        "top_cluster_sizes" -> topClusters.map(_._2).toSeq)
    }

    // ---- minhash LSH near-dup with census --------------------------------
    var pairs: org.apache.spark.sql.DataFrame = null
    var nPairs = 0L
    phase("minhash_lsh_capped") {
      val (p, stats) = Dedup.minhashNearDupsWithStats(
        corpus, "doc_id", "text", minJaccard = minJ, bucketCap = bucketCap)
      pairs = graft.analytics.Materialize(p)
      nPairs = pairs.count()
      Seq("bucket_cap" -> bucketCap, "min_jaccard" -> minJ,
        "verified_pairs" -> nPairs,
        "n_buckets" -> stats.nBuckets,
        "capped_buckets" -> stats.cappedBuckets,
        "skipped_pairs_upper_bound" -> stats.skippedPairs)
    }

    // ---- connected components (reliable checkpoint dir) ------------------
    phase("dup_clusters_reliable") {
      val (labels0, iters) = Dedup.dupClustersWithStats(pairs,
        maxIter = 30, checkpointDir = Some(s"$base/cc_ckpt"))
      val labels = labels0
      val nComponents = labels.select("cluster_id").distinct().count()
      // recovery vs planted: a planted cluster (≥2 members) is INTACT iff
      // every member carries one shared label (absent members = LSH miss)
      val planted = corpus.filter(col("cluster") >= 0)
        .select(col("doc_id").as("id"), col("cluster"))
        .join(labels, Seq("id"), "left")
      val rec = planted.groupBy("cluster")
        .agg(count(lit(1)).as("members"),
          count(col("cluster_id")).as("labeled"),
          countDistinct(col("cluster_id")).as("labels"))
        .filter(col("members") >= 2)
        .agg(count(lit(1)).as("clusters_ge2"),
          coalesce(sum(when(col("labels") === 1 &&
            col("labeled") === col("members"), 1L).otherwise(0L)), lit(0L))
            .as("intact"))
        .head()
      val (ge2, intact) = (rec.getLong(0), rec.getLong(1))
      val megaIntact = planted.filter(col("cluster") === topClusters(0)._1)
        .agg(countDistinct(col("cluster_id")).as("l"),
          coalesce(sum(when(col("cluster_id").isNull, 1L).otherwise(0L)),
            lit(0L)).as("unlabeled")).head()
      Seq("cc_iterations" -> iters,
        "components" -> nComponents,
        "planted_clusters_ge2" -> ge2,
        "planted_recovered_intact" -> intact,
        "intact_frac" -> math.rint(intact.toDouble / ge2 * 1e4) / 1e4,
        "mega_cluster_labels" -> megaIntact.getLong(0),
        "mega_cluster_unlabeled_members" -> megaIntact.getLong(1))
    }

    // ---- exact prefix-filter jaccard join, rare-first order --------------
    phase("jaccard_prefix_freq") {
      // the exact pairwise join runs on the BOUNDED-cluster slice (unique
      // docs + clusters of ≤ ~25 members): emitting every pair of a 50k-
      // member mega-template is quadratic BY DEFINITION (C(50k,2) ≈ 1.2e9
      // rows) — at any scale the mega mass goes through the capped LSH path
      // first, and the exact join covers the long tail. Under the rare-
      // first frequency order the candidate join keys only on per-doc /
      // per-cluster rare tokens (df ≤ cluster size); the zipf HEAD vocab —
      // which under a hash order lands in ~20% of prefixes and would
      // produce ~C(0.2·n, 2) ≈ 5e10 candidates from the top token alone —
      // never enters a prefix.
      val slice = corpus.filter(col("cluster") === -1L ||
          col("cluster") >= 2000L)
        .withColumn("grp", lit("all"))
      val out = graft.analytics.Materialize(
        Dedup.jaccardPrefixJoin(slice, "doc_id", "text", "grp", minJ,
          freqOrder = true, assumeUniqueIds = true))
      val n = out.count()
      val sliceN = slice.count()
      Seq("slice_docs" -> sliceN, "exact_pairs" -> n,
        "note" -> ("mega clusters excluded: exact all-pairs output over a " +
          "50k-member template is quadratic by definition; the capped LSH " +
          "path owns that mass"))
    }

    // ---- benchmark decontamination over the full corpus ------------------
    phase("decontaminate") {
      // eval set = every 1009th doc (~0.1% — the realistic benchmark:corpus
      // asymmetry: the eval grams are a broadcast dim, the corpus 13-gram
      // explode feeds a map-side join and NEVER shuffles). Planted oracle:
      // a PRISTINE corpus member of a cluster with a pristine eval member
      // is an exact copy of the eval text — every one of its 13-grams hits,
      // so recall over that slice must be exactly 1.0.
      val bench = corpus.filter(col("doc_id") % 1009 === 0)
      val docs = corpus.filter(col("doc_id") % 1009 =!= 0)
      val hits = graft.analytics.Materialize(
        graft.dedup.Decontaminate.gramHits(docs, bench, "doc_id", "text",
          n = 13))
      val nHits = hits.count()
      val benchN = bench.count()
      val corpusN = docs.count()
      val benchGrams =
        graft.dedup.Decontaminate.benchGrams(bench, "text", 13).count()
      val evalPristineClusters = bench
        .filter(col("cluster") >= 0 && col("n_edits") === 0)
        .select("cluster").distinct()
      val expected = docs.filter(col("n_edits") === 0)
        .join(broadcast(evalPristineClusters), Seq("cluster"))
        .select(col("doc_id").as("id"))
      val expN = expected.count()
      val flaggedN = expected.join(hits, Seq("id"), "left_semi").count()
      // the real anti-join removal path at volume, then the ledger check:
      // survivors + contaminated must tile the corpus exactly
      val survivors = graft.dedup.Decontaminate.decontaminate(
        docs, bench, "doc_id", "text", n = 13, minHits = 1).count()
      Seq("bench_docs" -> benchN, "bench_distinct_13grams" -> benchGrams,
        "corpus_docs" -> corpusN,
        "contaminated_docs" -> nHits,
        "survivors" -> survivors,
        "survivors_tile_corpus" -> (survivors + nHits == corpusN),
        "pristine_sibling_expected" -> expN,
        "pristine_sibling_flagged" -> flaggedN,
        "pristine_sibling_recall" ->
          math.rint(flaggedN.toDouble / math.max(expN, 1L) * 1e4) / 1e4)
    }

    // ---- SimHash near-dup over the bounded-cluster slice -----------------
    phase("simhash_near_dup") {
      // simhashNearDups has no bucketCap: a mega template cluster sharing
      // one 16-bit band value is all-pairs BY CONSTRUCTION, so (same
      // rationale as the exact jaccard phase) the mega mass belongs to the
      // capped LSH path and this phase runs the bounded-cluster slice.
      // 16-bit bands are the 64-bit/hamming≤3 pigeonhole split; at larger
      // corpora the band count/width widens with the signature.
      val lim = math.min(nDocs, 1000000L)
      val slice = corpus
        .filter((col("cluster") === -1L || col("cluster") >= 2000L) &&
          col("doc_id") < lim)
      val sliceN = slice.count()
      val pairs = graft.analytics.Materialize(
        Dedup.simhashNearDups(slice, "doc_id", "text", maxHamming = 3))
      val nPairsSim = pairs.count()
      // recovery oracle: pristine members (n_edits = 0) of one cluster are
      // byte-identical texts → identical simhash → hamming 0 → guaranteed
      // band collision. Every planted pristine pair MUST be recovered;
      // edited members (1-2 token edits) land wherever the simhash bit
      // flips put them — their observed rate is the hamming≤3 S-curve,
      // reported, not asserted.
      val meta = slice.filter(col("cluster") >= 0)
        .select(col("doc_id"), col("cluster"), col("n_edits"))
      val plantedPristine = plantedPairs(meta.filter(col("n_edits") === 0))
      val plantedAll = plantedPairs(meta)
      val tagged = pairs
        .join(meta.select(col("doc_id").as("id_a"),
          col("cluster").as("cl_a"), col("n_edits").as("e_a")).hint("merge"),
          Seq("id_a"))
        .join(meta.select(col("doc_id").as("id_b"),
          col("cluster").as("cl_b"), col("n_edits").as("e_b")).hint("merge"),
          Seq("id_b"))
        .filter(col("cl_a") === col("cl_b"))
      val recSame = tagged.count()
      val recPristine = tagged
        .filter(col("e_a") === 0 && col("e_b") === 0).count()
      Seq("slice_docs" -> sliceN, "max_hamming" -> 3,
        "pairs" -> nPairsSim,
        "planted_pristine_pairs" -> plantedPristine,
        "recovered_pristine_pairs" -> recPristine,
        "pristine_recall" -> (if (plantedPristine == 0) 0.0
          else math.rint(recPristine.toDouble / plantedPristine * 1e4) / 1e4),
        "planted_cluster_pairs_any_edits" -> plantedAll,
        "recovered_same_cluster_pairs" -> recSame)
    }

    // ---- SimHash capped path over the mega-including slice ----------------
    phase("simhash_capped_mega") {
      // the shape the bounded-cluster phase above cannot exercise: mega
      // template clusters INCLUDED, bounded by the bucketCap star/chain
      // guard (r5) — a 16-bit band holding the zipf head cluster is
      // C(s,2) candidates uncapped, and the checkpoint-rooted self-join
      // is not AQE-skew-splittable, so the cap is the structural bound
      val lim = math.min(nDocs, 1000000L)
      val slice = corpus.filter(col("doc_id") < lim)
      val sliceN = slice.count()
      val (p, stats) = Dedup.simhashNearDupsWithStats(slice, "doc_id",
        "text", maxHamming = 3, bucketCap = 512)
      val pairs = graft.analytics.Materialize(p)
      val n = pairs.count()
      val top1 = topClusters(0)._1
      val megaIds = corpus.filter(col("cluster") === top1 &&
        col("doc_id") < lim).select(col("doc_id").as("id"))
      val megaN = megaIds.count()
      val inPair = pairs.select(col("id_a").as("id"))
        .unionByName(pairs.select(col("id_b").as("id"))).distinct()
      val covered = megaIds.join(inPair.hint("merge"), Seq("id"),
        "left_semi").count()
      Seq("slice_docs" -> sliceN, "bucket_cap" -> 512,
        "pairs" -> n,
        "n_buckets" -> stats.nBuckets,
        "capped_buckets" -> stats.cappedBuckets,
        "skipped_pairs_upper_bound" -> stats.skippedPairs,
        "mega_docs" -> megaN,
        "mega_docs_in_a_pair" -> covered,
        "mega_pair_coverage" -> (if (megaN == 0) 0.0
          else math.rint(covered.toDouble / megaN * 1e4) / 1e4))
    }

    // ---- embedding near-dup over the bounded-cluster slice ----------------
    phase("embedding_near_dup") {
      // same slice rationale; additionally capped at 400k ids — candidate
      // rows carry BOTH 64-dim vectors through the verify join, so volume
      // is budgeted by candidate count, and single-band hyperplane LSH at
      // 12 planes is the measured recall point (cluster vectors sit at
      // cosine ≳ 0.999; P[all 12 signs agree] ≈ (1 − θ/π)^12 ≈ 0.9)
      val lim = math.min(nDocs, 400000L)
      val slice = corpus
        .filter((col("cluster") === -1L || col("cluster") >= 2000L) &&
          col("doc_id") < lim)
        .select(col("doc_id"), col("cluster"), col("embedding"))
      val sliceN = slice.count()
      val pairs = graft.analytics.Materialize(Dedup.embeddingNearDups(
        slice, "doc_id", "embedding", minCosine = 0.95, planes = 12,
        dim = 64))
      val nPairsEmb = pairs.count()
      val meta = slice.filter(col("cluster") >= 0)
        .select(col("doc_id"), col("cluster"))
      val planted = plantedPairs(meta)
      val recovered = pairs
        .join(meta.select(col("doc_id").as("id_a"),
          col("cluster").as("cl_a")).hint("merge"), Seq("id_a"))
        .join(meta.select(col("doc_id").as("id_b"),
          col("cluster").as("cl_b")).hint("merge"), Seq("id_b"))
        .filter(col("cl_a") === col("cl_b")).count()
      // bucket census: the quadratic budget is Σ C(bucket, 2)
      val buckets = graft.analytics.Materialize(slice.select(
          graft.similarity.Ann.hyperplaneBucket(col("embedding"), 12, 64)
            .as("b"))
        .groupBy("b").agg(count(lit(1)).as("sz")))
      val bRow = buckets.agg(count(lit(1)), max("sz"),
        coalesce(sum(col("sz") * (col("sz") - 1) / 2), lit(0.0))).head()
      // the banded recall dial (r5) on the SAME slice: 4 bands of the
      // same 12 planes — 1−(1−r^12)^4 predicts ≈0.999 at the cluster
      // vectors' cos θ from the 0.949 single-band draw; band 0 ≡ the
      // single-band planes, so banded pairs ⊇ the single-band set
      val pairsB = graft.analytics.Materialize(Dedup.embeddingNearDups(
        slice, "doc_id", "embedding", minCosine = 0.95, planes = 12,
        dim = 64, bands = 4))
      val nPairsB = pairsB.count()
      val recoveredB = pairsB
        .join(meta.select(col("doc_id").as("id_a"),
          col("cluster").as("cl_a")).hint("merge"), Seq("id_a"))
        .join(meta.select(col("doc_id").as("id_b"),
          col("cluster").as("cl_b")).hint("merge"), Seq("id_b"))
        .filter(col("cl_a") === col("cl_b")).count()
      Seq("slice_docs" -> sliceN, "min_cosine" -> 0.95, "planes" -> 12,
        "pairs" -> nPairsEmb,
        "planted_cluster_pairs" -> planted,
        "recovered_cluster_pairs" -> recovered,
        "single_band_recall" -> (if (planted == 0) 0.0
          else math.rint(recovered.toDouble / planted * 1e4) / 1e4),
        "n_buckets" -> bRow.getLong(0), "max_bucket" -> bRow.getLong(1),
        "candidate_pairs_budget" -> bRow.getDouble(2).toLong,
        "bands" -> 4, "banded_pairs" -> nPairsB,
        "banded_recovered_cluster_pairs" -> recoveredB,
        "banded_recall" -> (if (planted == 0) 0.0
          else math.rint(recoveredB.toDouble / planted * 1e4) / 1e4))
    }

    // ---- embedding capped path over the mega-including slice --------------
    phase("embedding_capped_mega") {
      // mega template clusters INCLUDED: their members share near-identical
      // embeddings (cosine ≳ 0.999), so the whole cluster lands in ONE sign
      // bucket and the uncapped self-join is C(s,2) candidate rows each
      // carrying two 64-dim vectors — the bucketCap star/chain guard (r5)
      // is the structural bound, same as the simhash phase above. 400k-id
      // budget matches the bounded-slice embedding phase.
      val lim = math.min(nDocs, 400000L)
      val slice = corpus.filter(col("doc_id") < lim)
        .select(col("doc_id"), col("cluster"), col("embedding"))
      val sliceN = slice.count()
      val (p, stats) = Dedup.embeddingNearDupsWithStats(slice, "doc_id",
        "embedding", minCosine = 0.95, planes = 12, dim = 64,
        bucketCap = 512)
      val pairs = graft.analytics.Materialize(p)
      val n = pairs.count()
      val top1 = topClusters(0)._1
      val megaIds = slice.filter(col("cluster") === top1)
        .select(col("doc_id").as("id"))
      val megaN = megaIds.count()
      val inPair = pairs.select(col("id_a").as("id"))
        .unionByName(pairs.select(col("id_b").as("id"))).distinct()
      val covered = megaIds.join(inPair.hint("merge"), Seq("id"),
        "left_semi").count()
      Seq("slice_docs" -> sliceN, "bucket_cap" -> 512,
        "pairs" -> n,
        "n_buckets" -> stats.nBuckets,
        "capped_buckets" -> stats.cappedBuckets,
        "skipped_pairs_upper_bound" -> stats.skippedPairs,
        "mega_docs" -> megaN,
        "mega_docs_in_a_pair" -> covered,
        "mega_pair_coverage" -> (if (megaN == 0) 0.0
          else math.rint(covered.toDouble / megaN * 1e4) / 1e4))
    }

    // ---- IVF ANN over the full corpus ------------------------------------
    phase("ivf_topk") {
      val emb = corpus.select(col("doc_id"), col("embedding"))
      val queries = emb.filter(col("doc_id") < 64)
      val nlist = 128
      val cents = graft.similarity.Ann.trainIvfCentroids(
        emb, "doc_id", "embedding", nlist)
      val ivf = graft.analytics.Materialize(graft.similarity.Ann.ivfTopK(
        queries, emb, "doc_id", "doc_id", "embedding", 10, cents, nprobe = 8))
      val nIvf = ivf.count()
      val bf = graft.analytics.Materialize(graft.similarity.Ann
        .bruteForceTopK(queries, emb, "doc_id", "doc_id", "embedding", 10))
      val nBf = bf.count()
      // recall@10 vs exact brute force over all nDocs vectors, at two
      // nprobe settings — the recall/cost dial is the evidence (the corpus
      // mixes tight planted clusters with near-uniform unique vectors; the
      // uniform mass is IVF's documented hard case)
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val hit = df.select("query_id", "neighbor_id")
          .intersect(bf.select("query_id", "neighbor_id")).count()
        math.rint(hit.toDouble / nBf * 1e4) / 1e4
      }
      // time ONLY the nprobe=32 query execution (materialize then count);
      // the recall intersect against the brute-force frame runs untimed,
      // symmetric with how the nprobe=8 figure is produced
      val t32 = System.nanoTime()
      val ivf32 = graft.analytics.Materialize(graft.similarity.Ann.ivfTopK(
        queries, emb, "doc_id", "doc_id", "embedding", 10, cents,
        nprobe = 32))
      ivf32.count(): Unit
      val sec32 = (System.nanoTime() - t32) / 1e9
      val recall32 = recall(ivf32)
      Seq("nlist" -> nlist, "queries" -> 64, "k" -> 10,
        "ivf_rows" -> nIvf,
        "recall_at_10_nprobe8" -> recall(ivf),
        "recall_at_10_nprobe32" -> recall32,
        "nprobe32_wall_sec" -> math.rint(sec32 * 100) / 100)
    }

    // ---- lineage kill + resume at volume ---------------------------------
    phase("lineage_resume") {
      import graft.lineage.{ResumableRunner, SimulatedFailure}
      val docs = math.max(400000L, math.min(nDocs / 2, 1000000L))
      val pages = graft.synth.SynthPages.pages(spark, docs, partitions = 64)
      def checksum(dir: String): (Long, Long) = {
        val df = spark.read.parquet(dir)
        val r = df.agg(count(lit(1)),
          coalesce(sum(pmod(xxhash64(col("url"), col("keep").cast("string"),
            col("crawl_snapshot")), lit(1000000007L))), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      // interrupted: the runner dies after 2 waves (8 of 16 chunks)
      val killed =
        try { ResumableRunner.run(pages, s"$base/lin_out", s"$base/lin_led",
          "run1", failAfterWaves = Some(2)); -1 }
        catch { case _: SimulatedFailure => 2 }
      // resume from the lineage table: only the remaining chunks run
      val resumed = ResumableRunner.run(pages, s"$base/lin_out",
        s"$base/lin_led", "run1")
      // uninterrupted reference run
      ResumableRunner.run(pages, s"$base/lin_ref", s"$base/lin_led2", "ref")
      val (cN, cH) = checksum(s"$base/lin_out")
      val (rN, rH) = checksum(s"$base/lin_ref")
      Seq("docs" -> docs, "waves_before_kill" -> killed,
        "chunks_resumed" -> resumed.length,
        "rows_resumed_vs_uninterrupted" -> s"$cN/$rN",
        "checksum_equal" -> (cN == rN && cH == rH))
    }

    // ---- streaming near-dup at volume + batch re-verify bridge -----------
    phase("stream_near_dup") {
      // bounded-cluster slice (same rationale as the prefix join): cluster
      // sizes ≤ ~5 in the slice, so neither the stream's bucketCap FIFO
      // nor a batch cap truncates — candidate sets must then be IDENTICAL
      // (same signatures, same band keys), and stream ∘ exact re-verify
      // must equal the batch verified pair set at volume, not just on the
      // spec fixture
      val slice = corpus
        .filter((col("cluster") === -1L || col("cluster") >= 2000L) &&
          col("doc_id") < 400000L)
        .select(col("doc_id"), col("text"),
          lit(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")).as("ts"))
      val sliceN = slice.count()
      slice.repartition(16).write.mode("overwrite")
        .parquet(s"$base/stream_landing")
      val src = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 2) // force multi-micro-batch state
        .parquet(s"$base/stream_landing")
      // est threshold 0.4 << batch 0.8: P(est < 0.4 | J ≥ 0.8) ≈ 1e-8 with
      // 32 hashes, so the hit superset covers; re-verify tightens to exact
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamOps.nearDupStream(
          src, "doc_id", "text", "ts", minEstJaccard = 0.4)
        .writeStream.format("memory").queryName("scale_stream")
        .option("checkpointLocation", s"$base/stream_ckpt")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val streamSec = (System.nanoTime() - t0) / 1e9
      // measured, not assumed: the landing-file count over maxFilesPerTrigger
      // is an implementation detail of the write above — the progress log is
      // the ground truth for how many micro-batches actually carried rows
      val microBatches = q.recentProgress.count(_.numInputRows > 0)
      val hits = spark.table("scale_stream")
      val nHits = hits.select("id_a", "id_b").distinct().count()
      val reverified = graft.analytics.Materialize(Dedup.reverifyPairs(
        hits.toDF(), slice, "doc_id", "text", minJaccard = minJ))
      val batch = graft.analytics.Materialize(Dedup.minhashNearDups(
        slice, "doc_id", "text", minJaccard = minJ))
      val rv = reverified.select("id_a", "id_b")
      val bt = batch.select("id_a", "id_b")
      val equal = rv.exceptAll(bt).isEmpty && bt.exceptAll(rv).isEmpty
      Seq("slice_docs" -> sliceN,
        "micro_batches" -> microBatches,
        "stream_wall_sec" -> math.rint(streamSec * 100) / 100,
        "stream_docs_per_sec" -> math.rint(sliceN / streamSec),
        "candidate_hits" -> nHits,
        "reverified_pairs" -> reverified.count(),
        "batch_pairs" -> batch.count(),
        "stream_reverify_equals_batch" -> equal)
    }

    // ---- streaming state bound under the MEGA cluster ---------------------
    phase("stream_state_bound") {
      // The r4 stream phase ran the bounded-cluster slice (candidate-set
      // identity proof); THIS one streams a slice INCLUDING the zipf head
      // cluster with a SMALL bucketCap — the hot-template case where an
      // unbounded design accumulates O(cluster) state. Event time advances
      // with doc_id (1 s/doc) and files land in id order
      // (repartitionByRange), so the watermark genuinely moves and cold
      // buckets expire: state must PLATEAU at O(docs-per-lateness-window),
      // far under the O(slice) a growing store would show, while the FIFO
      // cap bounds the mega bucket's entry arrays and exact dups keep
      // pairing throughout.
      val top = topClusters(0)._1
      val lim = math.min(nDocs, 200000L)
      val slice = corpus
        .filter((col("cluster") === top || col("cluster") === -1L) &&
          col("doc_id") < lim)
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1767225600L) + col("doc_id")).as("ts"))
      val sliceN = slice.count()
      val megaIds = corpus.filter(col("cluster") === top &&
        col("doc_id") < lim).select(col("doc_id").as("id"))
      val megaN = megaIds.count()
      // land the files SEQUENTIALLY in id order: FileStreamSource orders
      // new files by modification time, so micro-batches then replay the
      // corpus in event-time order and the watermark advances monotonically
      // (a bulk repartitionByRange write lands parts in task-completion
      // order — event time would arrive shuffled and every batch would mix
      // late data; the operator survives that too, but THIS phase measures
      // the steady-state plateau, which needs an orderly replay)
      val landing = s"$base/state_landing"
      ToolFs.rmTree(new java.io.File(landing))
      val step = lim / 16
      for (i <- 0L until 16L)
        // last range takes the division remainder — every slice doc must
        // land, or the coverage/plateau metrics (computed over the FULL
        // slice) would silently overstate their denominators at a lim
        // that is not a multiple of 16
        slice.filter(col("doc_id") >= i * step &&
            (if (i == 15L) lit(true) else col("doc_id") < (i + 1) * step))
          .coalesce(1).write.mode("append").parquet(landing)
      val src = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 2)
        .parquet(landing)
      val cap = 16
      val q = graft.streaming.StreamOps.nearDupStream(
          src, "doc_id", "text", "ts", minEstJaccard = 0.8,
          lateness = "1 hour", bucketCap = cap)
        .writeStream.format("memory").queryName("state_stream")
        .option("checkpointLocation", s"$base/state_ckpt")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      // DETERMINISM CAVEAT (the one phase where it is soft): under FIFO
      // eviction, WHICH entries a row pairs against depends on intra-batch
      // arrival order into the group iterator, which Spark does not
      // contract across runs — candidate_hits / coverage have been
      // observed identical across four runs on this host, but unlike
      // every other phase that is empirical, not structural. The
      // structural invariants here are the state plateau and the cap.
      val stateRows = q.recentProgress.filter(_.numInputRows > 0)
        .map(p => p.stateOperators.headOption.map(_.numRowsTotal)
          .getOrElse(0L)).toSeq
      val hits = spark.table("state_stream")
      val nHits = hits.select("id_a", "id_b").distinct().count()
      // exact dups still pair: fraction of mega docs that appear in ≥1 hit
      // (every arrival pairs against the bucket's current FIFO window)
      val inHit = hits.select(col("id_a").as("id"))
        .unionByName(hits.select(col("id_b").as("id"))).distinct()
      val megaCovered = megaIds.join(inHit.hint("merge"), Seq("id"),
        "left_semi").count()
      val unboundedRows = sliceN * graft.dedup.Dedup.Bands
      Seq("slice_docs" -> sliceN, "mega_docs" -> megaN,
        "bucket_cap" -> cap,
        "micro_batches" -> stateRows.length,
        "state_rows_per_batch" -> stateRows,
        "peak_state_rows" -> (if (stateRows.isEmpty) 0L else stateRows.max),
        "unbounded_would_be_rows" -> unboundedRows,
        "state_plateaued" -> (stateRows.nonEmpty &&
          stateRows.max < unboundedRows / 3),
        "candidate_hits" -> nHits,
        "mega_docs_in_a_hit" -> megaCovered,
        "mega_hit_coverage" -> (if (megaN == 0) 0.0
          else math.rint(megaCovered.toDouble / megaN * 1e4) / 1e4))
    }

    // ---- AQE skew-join split on the zipf host key -------------------------
    phase("aqe_skew_join") {
      // dimension-style host join with broadcast disabled: the zipf head
      // host (~18% of all rows) lands in one shuffle partition that AQE
      // must split. Band-key skew inside the LSH join is handled
      // STRUCTURALLY (bucketCap star+chain, phase minhash_lsh_capped);
      // this validates the runtime path for joins we don't pre-shape.
      // broadcast disabled on BOTH the static and the AQE-runtime knobs:
      // a 1000-row dim would otherwise (correctly) broadcast and the skew
      // path would never run — this phase validates the skew machinery,
      // not the best plan for this join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      try {
        val big = corpus.select(col("doc_id"), col("host"), col("text"))
        // dim MATERIALIZED first: OptimizeSkewedJoin only rewrites
        // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an aggregate
        // between the shuffle stage and the sort defeats the pattern (the
        // run-1 artifact recorded skew_fired=false for exactly that shape)
        val dim = graft.analytics.Materialize(
          corpus.groupBy("host").agg(count(lit(1)).as("host_docs")))
        val joined = big.join(dim, "host")
        // run THIS Dataset's own query execution so the adaptive plan we
        // stringify is the finalized one (a write would execute a separate
        // QueryExecution and leave this plan un-adapted)
        val qe = joined.queryExecution
        qe.toRdd.count(): Unit
        val plan = qe.executedPlan.toString
        // Spark marks the rewritten join "skew=true" and the split-reader
        // nodes "AQEShuffleRead ... skewed"
        val skewNodes = "skew=true".r.findAllIn(plan).length +
          "skewed".r.findAllIn(plan).length
        val excerpt = plan.linesIterator
          .filter(l => l.contains("skew") || l.contains("SortMergeJoin"))
          .take(5).map(_.trim.take(180)).mkString(" | ")
        Seq("rows" -> nDocs, "skew_split_nodes" -> skewNodes,
          "skew_fired" -> (skewNodes > 0), "plan_excerpt" -> excerpt)
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }

    val out: Seq[(String, Any)] = Seq(
      "generated_by" -> "graft.tools.DedupScale",
      "docs" -> nDocs,
      "cores" -> 32,
      "heap" -> (Runtime.getRuntime.maxMemory / (1 << 20) + "MB"),
      "phases" -> phases.toSeq)
    val json = renderJson(out)
    // non-default scales get their own artifact file — a 5M/10M regen must
    // never clobber the committed 2M evidence
    val outFile =
      if (nDocs == 2000000L) "DEDUP_SCALE.json"
      else if (nDocs % 1000000L == 0L) s"DEDUP_SCALE_${nDocs / 1000000L}M.json"
      else s"DEDUP_SCALE_$nDocs.json"
    Files.writeString(Paths.get(outFile), json + "\n")
    println(json)
    spark.stop()
  }
}
