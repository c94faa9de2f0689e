package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver benchmark contract: prints ONE JSON line
  * `{"metric":…,"value":N,"unit":…,"queries":{name:sec,…},"sf":…}`.
  *
  * Three parts:
  *  1. analytic query timings over `SPARK_GRAFT_SF_DIR` at local[CPUS],
  *     each to a noop sink; failures are surfaced, never timed
  *  2. the north-rule scaling evidence: the full quality pipeline
  *     (langid + perplexity + heuristics + scrub + keep + salted
  *     repartition) over the SAME deterministic synthetic corpus at
  *     local[4], local[16] and local[CPUS], for a FIXED number of
  *     interleaved rounds (the sandbox host throttles CPU in bursts; the
  *     fixed round count avoids optional-stopping bias and every draw is
  *     emitted in the JSON so the evidence is auditable). Scaling
  *     efficiency tp(4N)/(4·tp(N)) — the sandbox proxy for N vs 4N
  *     executors — is headlined as the MEDIAN of the per-round
  *     adjacent-in-time ratios (estimator rationale at the computation);
  *     the best-draw-per-series figure the r1/r2 artifacts recorded
  *     stays in the JSON as a secondary field, and the host envelope is
  *     strictly per-round.
  *  3. one end-to-end run including the snapshot-partitioned parquet write.
  *     Reported separately: the sandbox disk is cgroup-throttled to
  *     ~56 MB/s buffered writeback, so the write path measures the disk,
  *     not the engine (a cluster writes to distributed storage).
  *
  * Shuffle/local dirs go to /dev/shm for the same reason.
  */
object Bench {
  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Pipeline + salted repartition, noop sink (see class doc). */
  private def pipelineNoop(spark: SparkSession, docs: Long): Double = {
    val t0 = System.nanoTime()
    graft.pipeline.QualityPipeline.annotate(
        graft.synth.SynthPages.pages(spark, docs, partitions = 128))
      .repartition(32, col("crawl_snapshot"),
        pmod(xxhash64(col("url")), lit(32)))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def measureAt(cpus: Int, docs: Long): Double = {
    val s = newSession(cpus)
    pipelineNoop(s, 15000L) // JIT/codegen warmup
    val sec = pipelineNoop(s, docs)
    s.stop()
    sec
  }

  /** Pure-JVM embarrassingly-parallel scoring throughput at `threads` —
    * the HOST's parallel-scaling envelope. No Spark, no shuffle, no
    * scheduler: each thread scores the same doc mix independently, so any
    * sub-linearity here is the machine (turbo clocks at low thread counts,
    * shared LLC/memory bandwidth at high counts), not the engine. Separate
    * 4N-executor machines on a real cluster share none of that, so the
    * engine's N→4N efficiency is reported both raw and normalized by this
    * envelope.
    */
  private def cpuEnvelope(threads: Int, docsPerThread: Int): Double = {
    val texts = (0 until 256)
      .map(i => graft.synth.SynthPages.gen(i.toLong).text).toArray
    val w = graft.stages.LangIdModel.weights
    val lm = graft.stages.PerplexityModel.default
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        var acc = 0L
        var i = 0
        while (i < docsPerThread) {
          val txt = texts(i % texts.length)
          val h = graft.stages.HeuristicsScalar.compute(txt)
          val sc = graft.stages.ScrubScalar(txt)
          val (p, _) = graft.stages.LangIdModel.predict(txt, w)
          acc += h.docLenWords + sc.nSlurs + lm.perplexity(txt).toLong +
            (if (p == "ron") 1 else 0)
          i += 1
        }
        sink.addAndGet(acc)
      })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    require(sink.get() != Long.MinValue) // keep the work observable
    threads.toLong * docsPerThread / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    // the JSON contract uses f-interpolated doubles, which follow the
    // default locale — pin it so a comma-decimal host can't break the line
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lowCpus = math.max(1, cpus / 4)
    val pipelineDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "250000").toLong

    // --- part 1: analytic queries at local[cpus] ---------------------------
    // Each query runs to a noop SINK (not count(): count lets Catalyst prune
    // projections and eliminate sorts, timing projection-heavy queries as
    // bare scans). A throwing query is recorded as -1 and surfaced in
    // "failed" — never as a fast timing.
    val spark = newSession(cpus)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    def runNoop(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    SparkEntry.queries.get("q_a1_group_count")
      .foreach(runNoop) // session warmup
    // TWO draws per query, headline = best-of-2: the host burst-throttles
    // CPU in minute-scale episodes, and a single throttled draw has
    // masqueraded as a 2× regression in a past round artifact
    // (q_dedup_clusters 6.86 s recorded vs 3.05 s re-timed). Both draws are
    // emitted (`query_draws`) so the artifact carries its own noise bounds.
    val queryDraws = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val draws = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try { runNoop(fn); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
          }
        }
        if (draws.exists(_ < 0)) failed += name
        name -> draws
    }
    val results = queryDraws.map { case (name, draws) =>
      name -> (if (draws.exists(_ < 0)) -1.0 else draws.min)
    }
    // --- part 3 (while the big session is up): parquet end-to-end ----------
    val tp0 = System.nanoTime()
    graft.pipeline.QualityPipeline.run(
      graft.synth.SynthPages.pages(spark, 50000L, partitions = 128),
      "/tmp/graft_bench_parquet")
    val parquetSec = (System.nanoTime() - tp0) / 1e9
    val parquetDocs = 50000L
    spark.stop()

    // --- part 2: interleaved best-of-2 scaling measurement -----------------
    // Scaling pair: N=4 vs 4N=16 when the box allows (cleanest window on a
    // 32-vCPU host — full-width local[32] adds shared-LLC/membw contention
    // and neighbor noise that measures the host, not the engine); the
    // full-width throughput is still measured and reported as the headline.
    val (nLow, nHigh) =
      if (cpus >= 16) (4, 16) else (lowCpus, cpus)
    // FIXED sample count for every series (no data-dependent stopping: a
    // "resample while the ratio looks bad" rule is one-sided optional
    // stopping that biases the reported efficiency upward and makes runs
    // non-comparable). Host burst-throttle episodes last minutes, so the
    // three series are INTERLEAVED and each takes best-of-k — a calm window
    // anywhere in the run benefits all three series equally. k is emitted
    // in the JSON so the evidence is auditable.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "6").toInt
    // the scaling pair runs 2× the headline docs so fixed per-job overheads
    // (scheduling, codegen, broadcast) amortize on the WIDE side — at 250k
    // docs local[16] finishes in ~4 s and those constants read as false
    // scaling loss a real 4N-executor cluster with hour-long stages never
    // sees; at 500k they are < 3% of the measurement
    val pairDocs = pipelineDocs * 2
    val fulls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val highs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val lows = scala.collection.mutable.ArrayBuffer.empty[Double]
    val envHighs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val envLows = scala.collection.mutable.ArrayBuffer.empty[Double]
    cpuEnvelope(nHigh, 2000) // JIT warmup for the envelope probe
    // Within a round the N and 4N runs (and their envelope probes) are
    // ADJACENT in time, so each round's efficiency ratio is taken inside one
    // host-throttle regime; ratios never mix draws from different rounds.
    for (_ <- 1 to rounds) {
      fulls += measureAt(cpus, pipelineDocs)
      lows += measureAt(nLow, pairDocs)
      envLows += cpuEnvelope(nLow, 12000)
      highs += measureAt(nHigh, pairDocs)
      envHighs += cpuEnvelope(nHigh, 12000)
    }
    val secFull = fulls.min
    val secHigh = highs.min
    val secLow = lows.min
    val tpFull = pipelineDocs / secFull
    val tpHigh = pairDocs / secHigh
    val tpLow = pairDocs / secLow
    // HEADLINE efficiency = MEDIAN over rounds of the per-round ratio
    // tp(4N)/(4·tp(N)), where each round's N and 4N runs are adjacent in
    // time. Estimator rationale, learned across seven recorded runs:
    //  - pairing ADJACENT runs puts numerator and denominator inside one
    //    throttle regime by construction — the regime can still shift
    //    between the two adjacent runs, which makes a SINGLE round's
    //    ratio unphysical in either direction (observed 0.16–3.1), and
    //    the median across rounds suppresses exactly those outliers;
    //  - the former best-draw-per-series formula tp_best(4N)/(4·tp_best(N))
    //    instead needs a calm window to land in BOTH series and mixes
    //    regimes when it doesn't: across runs on identical code it swung
    //    0.736 (calm N draw, no calm 4N draw) to 1.018 (physically
    //    impossible > 1, the opposite mix), while the per-round median
    //    sat at 0.82–0.86. The noisier estimator is still emitted as
    //    `scaling_efficiency_best_draw` for continuity with the r1/r2
    //    artifacts; every raw draw is in `draws_sec` for audit.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val effBestDraw = tpHigh / (4.0 * tpLow)
    val effRounds = lows.zip(highs).map { case (l, h) => l / (4.0 * h) }.toSeq
    val efficiency = median(effRounds)
    // host envelope, per-round (never mixing rounds): the engine cannot
    // scale better than the machine lets ANY embarrassingly-parallel JVM
    // code scale in that round's throttle regime
    val envEffRounds = envHighs.zip(envLows)
      .map { case (h, l) => h / (4.0 * l) }.toSeq
    val envEffMedian = median(envEffRounds)
    val effVsHost = efficiency / envEffMedian

    def arr(xs: Seq[Double], fmt: Double => String = d => f"$d%.3f") =
      xs.map(fmt).mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val qd = queryDraws.map { case (k, ds) =>
      "\"" + k + "\":" + ds.map(d => f"$d%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"pipeline_docs_per_sec_local$cpus","value":${f"$tpFull%.1f"},""" +
      s""""unit":"docs/sec","queries":$qs,"query_draws":$qd,"sf":"$sfDir",""" +
      s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""samples_per_series":$rounds,""" +
      s""""pipeline":{"docs":$pipelineDocs,""" +
      s""""local${cpus}_sec":${f"$secFull%.2f"},"local${cpus}_docs_per_sec":${f"$tpFull%.1f"},""" +
      s""""scaling_pair":{"docs":$pairDocs,"n_cores":$nLow,"n4_cores":$nHigh,""" +
      s""""local${nLow}_sec":${f"$secLow%.2f"},"local${nLow}_docs_per_sec":${f"$tpLow%.1f"},""" +
      s""""local${nHigh}_sec":${f"$secHigh%.2f"},"local${nHigh}_docs_per_sec":${f"$tpHigh%.1f"},""" +
      s""""scaling_efficiency_n_to_4n":${f"$efficiency%.3f"},""" +
      s""""scaling_efficiency_best_draw":${f"$effBestDraw%.3f"},""" +
      s""""scaling_efficiency_rounds":${arr(effRounds)},""" +
      // keys are ROLE-based ("n"/"n4"/"full"), never "local$width": with
      // SPARK_GRAFT_CPUS ≤ 16 the 4N width equals the headline width and
      // width-based keys would collide, silently shadowing the 4N draws
      s""""draws_sec":{"n":${arr(lows.toSeq, d => f"$d%.2f")},""" +
      s""""n4":${arr(highs.toSeq, d => f"$d%.2f")},""" +
      s""""full":${arr(fulls.toSeq, d => f"$d%.2f")}},""" +
      s""""host_envelope_n_to_4n":${f"$envEffMedian%.3f"},""" +
      s""""host_envelope_rounds":${arr(envEffRounds)},""" +
      s""""scaling_efficiency_vs_host_envelope":${f"$effVsHost%.3f"}},""" +
      s""""parquet_write_docs_per_sec_throttled_disk":${f"${parquetDocs / parquetSec}%.1f"}},""" +
      s""""queries_total_sec":${f"${results.map(_._2).filter(_ >= 0).sum}%.2f"}}"""
    // contract: exactly ONE JSON line on stdout. ALSO persisted to
    // BENCH_LOCAL.json (committed per round): the driver's stdout capture
    // has truncated the line's head in a past round — the per-query map's
    // first ~20 entries vanished from the round artifact — so the repo
    // carries a self-contained copy regardless of any capture window.
    println(line)
    // best-effort by design: the println above IS the contract — a
    // read-only or foreign cwd must not turn a finished bench run into a
    // nonzero exit after the line already printed
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n"): Unit
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] BENCH_LOCAL.json not written: $e")
    }
  }
}
