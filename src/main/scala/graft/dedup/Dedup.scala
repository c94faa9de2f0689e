package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.synth.Det

/** Deduplication operators for the training-data pipeline, each designed so
  * the candidate-pair set is bounded by bucketing (no all-pairs cross join):
  *
  *  - exact: hash-groupBy (one shuffle on the digest)
  *  - MinHash+LSH: shingle → k minhashes → b bands → bucket self-join →
  *    exact-Jaccard verification of candidates only
  *  - SimHash: 64-bit fingerprint → (t+1) pigeonhole band buckets →
  *    Hamming ≤ t
  *  - embedding near-dup: random-hyperplane signs → bucket join → exact
  *    cosine on candidates (see graft.similarity.Ann for top-k search)
  *
  * At 10^12-doc scale every step is shuffle-on-key with AQE-coalesced
  * partitions; the only quadratic work is within a bucket, which band width
  * (r) / bucket granularity controls.
  *
  * JOIN STRATEGY: every join in this file carries an explicit `merge`
  * (sort-merge) hint. Both sides of every join here are corpus-scale or
  * candidate-scale BY CONSTRUCTION — signature/set frames are one row per
  * document, candidate frames can exceed the corpus — so a broadcast plan
  * is never correct at scale. Catalyst would still pick one: the frames
  * are eagerly materialized ([[graft.analytics.Materialize]], the 7×→1×
  * signature-compute fix), and a checkpointed Dataset's `LogicalRDD`
  * carries the PRE-execution size estimate of its origin plan — for
  * `spark.range`-rooted synthetic inputs (and generally for plans whose
  * array columns Catalyst prices at a fixed few bytes) that estimate
  * undercounts by orders of magnitude. The DEDUP_SCALE run caught this
  * live: at 2M docs the planner broadcast the 2M-row shingle-set frame
  * (~1.6 GB serialized) into the verify join and died on
  * `spark.driver.maxResultSize`; at sf0.01 the same plan looks fine.
  * DedupSpec pins the no-broadcast shape.
  */
object Dedup {

  // ---- exact -----------------------------------------------------------
  /** Exact duplicate groups by content digest; keeper = min(id). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper_id"))
      .filter(col("n_dups") > 1)

  /** Exact-dedup survivors: one row per distinct text (the min-id row).
    * r6: a `min_by` aggregate on the digest — the former
    * `row_number() OVER (PARTITION BY md5 ORDER BY id)` window exchanged
    * AND per-partition sorted every row; the aggregate partial-combines
    * map-side (co-located duplicates collapse before the shuffle) and
    * never sorts. Survivor identical: the min-id row per digest (the
    * id is the total order in both shapes).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns
    df.groupBy(md5(col(textCol)).as("__md5"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  // ---- MinHash + LSH ----------------------------------------------------
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = NumHashes / Bands // r = 4

  /** Adds `shingles` (hashed word n-grams) and `minhash` (array of
    * NumHashes longs via the one-pass native expression) columns.
    * Pure expressions — no shuffle.
    */
  def withMinHash(df: DataFrame, textCol: String, shingleN: Int = 3): DataFrame =
    df.withColumn("shingles",
        shingle_hashes(normTokens(col(textCol)), shingleN))
      .withColumn("minhash", minhash_signature(col("shingles"), NumHashes))

  /** LSH band key: hash of the band's r signature values + band index.
    * `private[graft]` so the streaming twin buckets identically.
    */
  private[graft] def bandKey(b: Int): Column =
    xxhash64(lit(b) +: (0 until RowsPerBand).map(r =>
      col("minhash").getItem(b * RowsPerBand + r)): _*)

  /** Candidate near-dup pairs (id_a < id_b) from LSH bucketing, each verified
    * with exact Jaccard over the shingle sets; `minJaccard` filters the
    * verified similarity. Shuffles: ONE band-key shuffle total (the
    * [[sizedBands]] explode+window, materialized so every pairing branch
    * reads it — see [[pairsFromSized]]) plus the candidate join-back.
    *
    * Skew guard: a band bucket larger than `bucketCap` (boilerplate/template
    * mega-clusters — the one place bucketed LSH still goes quadratic) is NOT
    * expanded all-pairs. Its candidates are (a) the bucket's members CHAINED
    * in minhash-signature order — identical and near-identical signatures
    * sort adjacent, so every run of true duplicates stays connected through
    * verified edges even when the bucket mixes content families — plus (b) a
    * star to the bucket's min-id member, which keeps component diameters
    * small in the common one-template case. 2(s−1) edges instead of C(s,2);
    * every emitted edge is still exact-Jaccard-verified, so a star/chain
    * edge between dissimilar docs is dropped, never a false merge. The one
    * honest recall caveat: NEAR-dups (J < 1) inside an oversized mixed
    * bucket connect only if they sort adjacent or share the representative;
    * lowering `bucketCap` restores the all-pairs guarantee bucket by bucket.
    *
    * The cap is OPT-IN (default `Int.MaxValue` = exact all-pairs in every
    * bucket): trading recall for boundedness is a deployment decision, not a
    * default. When a cap is set, pair it with [[minhashBucketCensus]] /
    * [[minhashNearDupsWithStats]] so the truncation is OBSERVED, not assumed
    * absent — a 100-TB operator can't read scaladoc at runtime.
    *
    * UNCAPPED-DEFAULT exposure (shared by the simhash and embedding twins):
    * the pairing self-join roots at the checkpointed pre-partitioned banded
    * frame, so it has no shuffle stage for AQE's OptimizeSkewedJoin to
    * split — with the default cap, a mega bucket's C(s,2) expansion runs in
    * the one task that owns its bucket key (pre-r5, each side re-exchanged
    * and AQE could at least split the straggler). A corpus that can contain
    * template mega-clusters should set `bucketCap`; that is the structural
    * bound, and the C(s,2) OUTPUT volume — not the task placement — is the
    * real quadratic term either way.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.8, shingleN: Int = 3,
      bucketCap: Int = Int.MaxValue): DataFrame =
    // The signature frame feeds the banded build plus the two verify
    // joins; Catalyst plans each branch separately (the subtrees differ
    // after pruning, so ReusedExchange never fires) and would recompute
    // tokenization + shingle + minhash per branch. Materializing sigs
    // once (eager localCheckpoint) replaces the per-branch signature
    // compute with one pass + block reads — the 100-TB term, where
    // tokenize+shingle+hash dominates the job. The banded frame is then
    // materialized AGAIN inside nearDupsFromSigs so the pairing runs one
    // band-key shuffle instead of one per branch (see pairsFromSized).
    nearDupsFromSigs(
      graft.analytics.Materialize(
        buildSigs(df, idCol, textCol, shingleN)),
      minJaccard, bucketCap)

  /** `(id, shingles, minhash)` signature frame shared by the pairing and
    * the census (empty shingle sets dropped — they can't near-dup).
    */
  private def buildSigs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    withMinHash(df, textCol, shingleN)
      .filter(size(col("shingles")) > 0)
      .select(col(idCol).as("id"), col("shingles"), col("minhash"))

  private def nearDupsFromSigs(sigs: DataFrame, minJaccard: Double,
      bucketCap: Int): DataFrame =
    pairsFromSized(sigs,
      graft.analytics.Materialize.partitioned(sizedBands(sigs)),
      minJaccard, bucketCap)

  /** Pairing over a MATERIALIZED [[sizedBands]] frame: the band explode +
    * window — the operator's one band-key shuffle — runs ONCE, and all
    * four pairing branches (both sides of the small-bucket self-join, the
    * mega-bucket star, and the mega-bucket chain) read the result. The
    * materialization is [[graft.analytics.Materialize.partitioned]], so
    * the checkpointed frame still ADVERTISES its hash partitioning and
    * sort order on `band_key`: the self-join and the census plan no
    * re-exchange and no re-sort of their own. (Before round 5 each branch
    * re-derived the banded frame — five separate
    * Generate+Exchange(band_key)+Window chains in the committed plan; the
    * dominant DEDUP_SCALE phase carried a ~5× avoidable shuffle factor on
    * exactly its hottest key.) `minhash` is deliberately NOT carried into
    * the banded frame: ×Bands duplication of the 32-long signature would
    * make the one shuffle ~10× wider per row; only the chain branch needs
    * it, only for capped-bucket rows, and joins it back from the already-
    * materialized sigs.
    */
  private def pairsFromSized(sigs: DataFrame, sized: DataFrame,
      minJaccard: Double, bucketCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val smallSide = sized.filter(col("bsz") <= bucketCap)
      .select("id", "band_key")
    val allPairs = smallSide.as("x").join(smallSide.as("y").hint("merge"),
        col("x.band_key") === col("y.band_key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val big = sized.filter(col("bsz") > bucketCap)
    val starPairs = big.filter(col("id") =!= col("bmin"))
      .select(col("bmin").as("id_a"), col("id").as("id_b"))
    // chain in signature order: identical/near-identical signatures sort
    // adjacent, so duplicate runs stay connected even if the star edge to
    // the representative fails verification (mixed-content mega bucket)
    val wOrd = Window.partitionBy("band_key")
      .orderBy(col("minhash"), col("id"))
    val chainPairs = big
      .join(sigs.select(col("id"), col("minhash")).hint("merge"), "id")
      .withColumn("prev", lag("id", 1).over(wOrd))
      .filter(col("prev").isNotNull)
      .select(least(col("prev"), col("id")).as("id_a"),
        greatest(col("prev"), col("id")).as("id_b"))

    // distinct collapses multi-band hits
    val pairs = allPairs.unionByName(starPairs).unionByName(chainPairs)
      .distinct()

    // verification: exact Jaccard over shingle SETS of the candidates only
    // (one intersection per pair; union size derived)
    val sets = sigs.select(col("id"), array_distinct(col("shingles")).as("sh"))
      .hint("merge")
    pairs
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      // r6: native one-pass set jaccard (sorted-probe) — bit-identical to
      // the size(array_intersect)/(|A|+|B|-i) algebra it replaces
      // (integer counts; JaccardParitySpec), no per-pair hash-set build
      .withColumn("jaccard",
        graft.functions.ArrayMath.jaccard_sets(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** One row per (id, band_key) with the bucket's size and min id — the
    * operator's ONE shuffle on band_key, materialized partition-preserving
    * by the callers so the census and every pairing branch read the same
    * frame without re-exchanging it.
    */
  private def sizedBands(sigs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = sigs.select(col("id"),
      explode(array((0 until Bands).map(bandKey): _*)).as("band_key"))
    val w = Window.partitionBy("band_key")
    banded
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min("id").over(w))
  }

  /** Truncation telemetry for a capped [[minhashNearDups]] run: one row of
    * `(n_buckets, capped_buckets, skipped_pairs)` where `skipped_pairs` is
    * the per-bucket `C(s,2) − max(s−1, 2s−4)` — a true UPPER bound on the
    * candidate pairs the star+chain expansion does not examine (and hence
    * on lost NEAR-dup pairs; exact dups still connect through the chain).
    * The star emits s−1 edges and the chain s−1, but they overlap on the
    * chain edges incident to the bucket representative `bmin` (one if bmin
    * sorts to a chain end, two if interior), so the DISTINCT examined pairs
    * can be as few as max(s−1, 2s−4) — subtracting the naive 2(s−1) would
    * understate the skips by up to 2 per capped bucket and break the bound.
    * Zero capped buckets ⇒ the capped run was exhaustive and its recall
    * caveat is vacuous.
    */
  def minhashBucketCensus(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bucketCap: Int = Int.MaxValue): DataFrame =
    censusFromSigs(buildSigs(df, idCol, textCol, shingleN), bucketCap)

  private def censusFromSigs(sigs: DataFrame, bucketCap: Int): DataFrame =
    censusFromSized(sizedBands(sigs.select("id", "minhash")), bucketCap)

  private def censusFromSized(sized: DataFrame, bucketCap: Int): DataFrame = {
    // `id === bmin` picks exactly one census row per bucket. Per-bucket
    // skipped pairs are clamped at 0: a just-over-cap bucket of size 2–3
    // emits MORE star+chain edges than C(s,2) and must not offset real
    // skips from larger buckets (or drive the total negative). C(s,2) is
    // computed in DOUBLE and the total saturates below Long.MaxValue: a
    // mega-bucket past ~4.3e9 members overflows s·(s−1) in long (ANSI
    // throws; non-ANSI wraps negative and would report 0 skips on the
    // worst bucket), and telemetry may be approximate but must never
    // fail the job or lie low. coalesce: zero buckets ⇒ 0s, not NULLs.
    val bszD = col("bsz").cast("double")
    sized
      .filter(col("id") === col("bmin"))
      .agg(count(lit(1)).as("n_buckets"),
        coalesce(sum(when(col("bsz") > bucketCap, 1L).otherwise(0L)),
          lit(0L)).as("capped_buckets"),
        least(lit(9.0e18),
          coalesce(sum(when(col("bsz") > bucketCap,
            greatest(lit(0.0), bszD * (bszD - 1) / 2 -
              greatest(bszD - 1, bszD * 2 - 4)))
            .otherwise(0.0)), lit(0.0)))
          .cast("long").as("skipped_pairs"))
  }

  /** Totals from [[minhashBucketCensus]]. */
  final case class BucketStats(nBuckets: Long, cappedBuckets: Long,
    skippedPairs: Long)

  /** [[minhashNearDups]] plus an EAGER truncation census. The
    * shingle/minhash signatures — the dominant cost of the whole pass — are
    * computed ONCE and materialized (eager localCheckpoint), and so is the
    * banded [[sizedBands]] frame: the census aggregate and all four pairing
    * branches read the SAME single band-key shuffle, so the stats never
    * double the signature OR the banding work. A capped run that actually
    * truncated logs a warning, so silent recall loss is impossible.
    */
  def minhashNearDupsWithStats(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.8, shingleN: Int = 3,
      bucketCap: Int = Int.MaxValue): (DataFrame, BucketStats) = {
    val sigs = graft.analytics.Materialize(
      buildSigs(df, idCol, textCol, shingleN))
    val sized = graft.analytics.Materialize.partitioned(sizedBands(sigs))
    val stats = censusStats("minhashNearDups", bucketCap, sized)
    (pairsFromSized(sigs, sized, minJaccard, bucketCap), stats)
  }

  /** Runs the truncation census over a sized banded frame, converts the
    * one-row result to [[BucketStats]], and logs the shared capped-run
    * warning — the one census-and-warn contract all three
    * `*NearDupsWithStats` operators share (a wording or field change lands
    * once, not per operator).
    */
  private def censusStats(opName: String, bucketCap: Int,
      sized: DataFrame): BucketStats = {
    val row = censusFromSized(sized, bucketCap).collect()(0)
    val stats = BucketStats(row.getLong(0), row.getLong(1), row.getLong(2))
    if (stats.cappedBuckets > 0)
      System.err.println(
        s"[dedup] $opName bucketCap=$bucketCap truncated " +
          s"${stats.cappedBuckets} bucket(s); up to ${stats.skippedPairs} " +
          "candidate pair(s) not examined — near-dup recall inside those " +
          "buckets is adjacency/representative only")
    stats
  }

  /** Batch EXACT re-verification of a candidate pair frame against the
    * stored documents — the bridge that composes estimate-based paths back
    * to exactness. [[graft.streaming.StreamOps.nearDupStream]] emits
    * signature-agreement ESTIMATES of Jaccard (bounded state cannot hold
    * shingle sets); piping its hits through this function yields the same
    * verified semantics as [[minhashNearDups]]: join each (id_a, id_b) to
    * its texts, recompute the shingle sets with the SAME parameters, keep
    * exact J ≥ `minJaccard`.
    *
    * Scale shape: the document side is PRUNED to ids that appear in a hit
    * (left-semi join) BEFORE any shingling, so tokenization cost is linear
    * in the hit set, not the corpus; the pruned set frame is materialized
    * once and feeds both verify joins. Run the stream at a LOWER estimate
    * threshold than the batch target (estimate se ≈ √(J(1−J)/32) ≈ 0.07 at
    * J = 0.8) so its hit superset covers the exact answer, then re-verify
    * at the target — StreamOpsSpec pins stream ∘ reverify ≡ batch.
    */
  def reverifyPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, minJaccard: Double, shingleN: Int = 3): DataFrame = {
    val hits = pairs.select("id_a", "id_b").distinct()
    val hitIds = hits.select(col("id_a").as("id"))
      .unionByName(hits.select(col("id_b").as("id"))).distinct()
    val sets = graft.analytics.Materialize(
      docs.select(col(idCol).as("id"), col(textCol).as("__text"))
        .join(hitIds.hint("merge"), Seq("id"), "left_semi")
        .select(col("id"), array_distinct(
          shingle_hashes(normTokens(col("__text")), shingleN)).as("sh"))
        .filter(size(col("sh")) > 0))
      .hint("merge")
    hits
      .join(sets.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        graft.functions.ArrayMath.jaccard_sets(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------
  /** SimHash near-dup pairs: `maxHamming + 1` near-even-width band buckets
    * over the 64 signature bits (pigeonhole — a pair within Hamming
    * distance ≤ maxHamming differs in at most maxHamming bits, so at least
    * one of the maxHamming + 1 bands is bit-identical and the pair shares
    * a bucket), then exact Hamming verification via bit_count. At the
    * default maxHamming = 3 this is the classic 4 × 16-bit split; the band
    * count FOLLOWS the threshold so a caller asking for Hamming ≤ 5 gets
    * the full candidate guarantee instead of the silent recall loss a
    * fixed 4-band scheme gives every threshold above 3 (a hamming-4 pair
    * whose flipped bits land in four different 16-bit quarters collides in
    * NO fixed band). The honest trade is candidate volume: more bands
    * means narrower bands, coarser buckets, and a recall=1 candidate set
    * that grows with the threshold — the inherent Hamming-LSH dial, now
    * priced by the caller's own `maxHamming` instead of silently wrong.
    *
    * `bucketCap` is the same OPT-IN mega-bucket skew guard as
    * [[minhashNearDups]]: a band bucket larger than the cap is not
    * expanded all-pairs — its members CHAIN in (sim, id) order (identical
    * signatures sort adjacent, so byte-identical duplicate runs stay
    * connected) plus a STAR to the bucket's min-id member; every edge is
    * still exact-Hamming-verified, so a star/chain edge between
    * dissimilar docs is dropped, never a false merge. Pair with
    * [[simhashNearDupsWithStats]] so a capped run's truncation is
    * OBSERVED. (Rationale: the checkpoint-rooted self-join below is not
    * AQE-skew-splittable, and a 16-bit band holding a 50k-doc template
    * cluster is C(50k,2) candidate pairs with or without AQE — the cap is
    * the structural fix, exactly as for minhash.)
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bucketCap: Int = Int.MaxValue): DataFrame =
    simhashPairsFromBanded(
      simhashBanded(df, idCol, textCol, simhashBandCount(maxHamming)),
      maxHamming, bucketCap)

  /** [[simhashNearDups]] plus the eager truncation census (same
    * [[BucketStats]] contract and logging as the minhash twin).
    */
  def simhashNearDupsWithStats(df: DataFrame, idCol: String,
      textCol: String, maxHamming: Int = 3,
      bucketCap: Int = Int.MaxValue): (DataFrame, BucketStats) = {
    val banded = simhashBanded(df, idCol, textCol,
      simhashBandCount(maxHamming))
    val stats = censusStats("simhashNearDups", bucketCap, banded)
    (simhashPairsFromBanded(banded, maxHamming, bucketCap), stats)
  }

  /** Pigeonhole band count for a Hamming threshold. 63 is the honest
    * ceiling: maxHamming = 64 would mean "any pair of 64-bit words", for
    * which banding cannot help (and 64 one-bit bands already admit every
    * pair differing in ≤ 63 bits) — a threshold that high is a dial typo,
    * not a similarity request.
    */
  private def simhashBandCount(maxHamming: Int): Int = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming = $maxHamming must be in [0, 63]")
    maxHamming + 1
  }

  /** The banded SimHash frame, materialized once, partitioned+sorted on
    * the join keys: tokenize+SimHash runs a single pass (the self-join's
    * two pruned subtrees would otherwise each recompute it — and each
    * re-exchange its side), and every pairing branch plus the census read
    * the checkpointed frame with no further exchange. Carries the
    * bucket's size, min id, and the min-id member's signature (`bsim`,
    * 8 B/row — lets the star branch verify inline without a join back).
    */
  private def simhashBanded(df: DataFrame, idCol: String,
      textCol: String, nBands: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 64 bits split into nBands contiguous bands, widths as even as
    // possible (the wider-by-one bands first): offsets(b) .. offsets(b+1).
    // For the default 4 bands this is exactly the historic 16/16/16/16
    // split — same bucket keys, byte-identical output.
    val base = 64 / nBands
    val rem = 64 % nBands
    val offsets = (0 until nBands).scanLeft(0)((o, b) =>
      o + base + (if (b < rem) 1 else 0))
    def bandBits(b: Int): Column = {
      val width = offsets(b + 1) - offsets(b)
      // (1L << 64) wraps to 1 (JVM shifts are mod 64): the one full-width
      // band (maxHamming = 0 ⇒ exact-signature buckets) takes sim whole
      if (width == 64) col("sim")
      else shiftright(col("sim"), offsets(b))
        .bitwiseAND(lit((1L << width) - 1))
    }
    val w = Window.partitionBy("band", "bits")
    graft.analytics.Materialize.partitioned(
      df.select(col(idCol).as("id"),
          simhash64(normTokens(col(textCol))).as("sim"))
        .select(col("id"), col("sim"),
          explode(array((0 until nBands).map(b =>
            struct(lit(b).as("band"), bandBits(b).as("bits"))
          ): _*)).as("bk"))
        .select(col("id"), col("sim"), col("bk.band"), col("bk.bits"))
        .repartition(col("band"), col("bits"))
        .withColumn("bsz", count(lit(1)).over(w))
        .withColumn("bmin", min("id").over(w))
        .withColumn("bsim", min_by(col("sim"), col("id")).over(w)))
  }

  private def simhashPairsFromBanded(banded: DataFrame, maxHamming: Int,
      bucketCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val small = banded.filter(col("bsz") <= bucketCap)
    val allPairs = small.as("x").join(small.as("y").hint("merge"),
        col("x.band") === col("y.band") && col("x.bits") === col("y.bits") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hamming(col("x.sim"), col("y.sim")).as("hamming"))
    val big = banded.filter(col("bsz") > bucketCap)
    // bmin < id always, so the star pair is already (id_a < id_b)
    val starPairs = big.filter(col("id") =!= col("bmin"))
      .select(col("bmin").as("id_a"), col("id").as("id_b"),
        hamming(col("bsim"), col("sim")).as("hamming"))
    val wOrd = Window.partitionBy("band", "bits")
      .orderBy(col("sim"), col("id"))
    val chainPairs = big
      .withColumn("prev_id", lag("id", 1).over(wOrd))
      .withColumn("prev_sim", lag("sim", 1).over(wOrd))
      .filter(col("prev_id").isNotNull)
      .select(least(col("prev_id"), col("id")).as("id_a"),
        greatest(col("prev_id"), col("id")).as("id_b"),
        hamming(col("prev_sim"), col("sim")).as("hamming"))
    allPairs.unionByName(starPairs).unionByName(chainPairs)
      .distinct() // hamming is deterministic per pair — multi-band safe
      .filter(col("hamming") <= maxHamming)
  }

  // ---- n-gram Jaccard (direct, bounded scope) -----------------------------
  /** DUPLICATE-ID CONTRACT shared by all three jaccard entry points
    * ([[jaccardPrefixJoin]], [[jaccardWithinGroup]],
    * [[jaccardWithinGroupLsh]]): rows sharing (grp, id) merge to their
    * shingle/token-set UNION before any pairing, so every entry point
    * computes the same per-(grp, id) sets and their verified outputs agree
    * on duplicate-id inputs (one output row per pair, never one per input-
    * row combination). The guard costs one map-side-combined aggregate
    * exchange; callers that OWN the uniqueness contract (e.g. output of
    * [[exactDedup]], or a table with a unique key) skip it with
    * `assumeUniqueIds = true` — under which duplicate-id inputs are
    * undefined behavior (ghost rows, inflated sizes), exactly like any
    * violated uniqueness contract.
    */
  private def mergedShingleSets(df: DataFrame, idCol: String,
      textCol: String, groupCol: String, shingleN: Int,
      assumeUniqueIds: Boolean): DataFrame = {
    val perRow = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      array_distinct(shingle_hashes(normTokens(col(textCol)), shingleN))
        .as("sh"))
    val merged =
      if (assumeUniqueIds) perRow
      else perRow.groupBy("grp", "id")
        .agg(array_distinct(flatten(collect_list(col("sh")))).as("sh"))
    merged.filter(size(col("sh")) > 0)
  }

  /** Exact pairwise word-n-gram Jaccard within a grouping column (e.g. a
    * pre-bucket like source/host). The group bounds the quadratic work.
    * Duplicate-id handling per [[mergedShingleSets]]'s shared contract.
    */
  def jaccardWithinGroup(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minJaccard: Double, shingleN: Int = 3,
      assumeUniqueIds: Boolean = false): DataFrame = {
    // materialized once: both sides of the self-join would otherwise
    // re-tokenize + shingle every document (the same 2× the siblings fix)
    val sets = mergedShingleSets(df, idCol, textCol, groupCol, shingleN,
        assumeUniqueIds)
      .transform(graft.analytics.Materialize.apply)
    // size-ratio pruning (similarity-join standard): J(A,B) ≤ min/max of the
    // set sizes, so J ≥ t requires min ≥ t·max — evaluated in the join
    // condition before the expensive intersection. 1e-9 slack: binary-float
    // products of integer sizes can misround above the exact boundary
    val sizeOk =
      size(col("x.sh")).cast("double") >=
        lit(minJaccard) * size(col("y.sh")) - 1e-9 &&
      size(col("y.sh")).cast("double") >=
        lit(minJaccard) * size(col("x.sh")) - 1e-9
    // |A∪B| = |A| + |B| − |A∩B| for distinct sets: one intersection, no
    // union — the native sorted-probe jaccard (r6) computes it in one pass
    sets.as("x").join(sets.as("y").hint("merge"),
        col("x.grp") === col("y.grp") && col("x.id") < col("y.id") && sizeOk)
      .withColumn("jaccard",
        graft.functions.ArrayMath.jaccard_sets(col("x.sh"), col("y.sh")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("x.grp").as("grp"), col("x.id").as("id_a"),
        col("y.id").as("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard similarity join via PREFIX FILTERING (PPJoin-style):
    * candidate pairs come from an equi-join on (group, prefix-token)
    * instead of a group-quadratic theta-join, so cost is driven by token
    * co-occurrence, not group size — with EXACT results (prefix filtering
    * is lossless, unlike the LSH variant below).
    *
    * Soundness: order every set by one total order (token hash, tie-broken
    * by the token — a deterministic proxy for the classic rare-first
    * frequency order, spreading stopwords out of the prefix). For
    * J(A,B) ≥ t the required overlap is ≥ ⌈t·max(|A|,|B|)⌉, and two sets
    * with that much overlap must share a token within their first
    * |X| − ⌈t·|X|⌉ + 1 = ⌊(1−t)·|X|⌋ + 1 tokens under any common order
    * (Chaudhuri/Xiao prefix-filter lemma) — so the token join produces a
    * candidate superset; exact verification then keeps exactly J ≥ t.
    */
  /** Token order for the prefix filter. Correctness needs ANY one total
    * order shared by all sets (the prefix-filter lemma); cost does not:
    * prefixes drawn under a RARE-FIRST order contain the corpus's rare
    * tokens, so the (grp, token) candidate join fans out on tokens few
    * documents share — the classic PPJoin frequency order. `freqOrder =
    * true` computes the exact document-frequency dictionary in one
    * aggregate and orders by (df, token); `false` uses the hash-of-token
    * proxy (no extra pass — fine when token frequencies are near-uniform).
    * Measured on the synthetic sf0.1 corpus (uniform vocab, no stopword
    * skew): hash 2.3–2.8 s vs freq 3.2–3.9 s — the dictionary passes don't
    * pay there, so hash stays the default; on real web text the frequency
    * order is the 100-TB choice, since stopword-led prefixes otherwise
    * create quadratic hot keys in the candidate join. DedupSpec pins that
    * both orders produce the identical verified pair set.
    */
  /** @param assumeUniqueIds caller contract that (groupCol, idCol) is
    *   unique — skips the duplicate-id merge aggregate (one exchange of
    *   the token arrays; real money at volume when the caller has just
    *   deduplicated). If the contract is violated, the two token orders
    *   may disagree on duplicate-id rows (the pre-guard divergence). The
    *   same guard + opt-out applies to ALL jaccard entry points — see
    *   [[mergedShingleSets]] for the shared duplicate-id contract.
    */
  def jaccardPrefixJoin(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minJaccard: Double,
      freqOrder: Boolean = false,
      assumeUniqueIds: Boolean = false): DataFrame = {
    // duplicate-id guard: rows sharing (grp, id) merge to their token-set
    // UNION up front, so BOTH token orders see identical per-(grp, id) sets.
    // (Previously the hash order kept duplicate-id rows as separate prefix
    // sources — ghost self-pairs filtered only by `id < id` — while the
    // freq order's re-group merged them: a documented but easy-to-trip
    // semantic divergence, now closed; DedupSpec pins order agreement ON a
    // duplicate-id input.) collect_list arrival order is nondeterministic
    // but the flattened DISTINCT set is order-free, and both orders re-sort
    // it. Cost: one aggregate exchange on (grp, id) — partial-aggregated
    // map-side; skippable via `assumeUniqueIds` when the caller owns the
    // uniqueness contract.
    val perRow = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      array_distinct(split(col(textCol), " ")).as("toks0"))
    val base =
      if (assumeUniqueIds) perRow.withColumnRenamed("toks0", "toks")
      else perRow.groupBy("grp", "id")
        .agg(array_distinct(flatten(collect_list(col("toks0")))).as("toks"))
    val orderedSets =
      if (!freqOrder)
        // r6: native (xxhash64, token)-ascending sort — one codegen'd call
        // per row; the transform∘array_sort∘transform HOF chain it
        // replaces ran CodegenFallback-interpreted with one xxhash64 eval
        // per token per lambda pass (same hash kernel, same tie order, so
        // the ordered arrays are identical — ArrayMathParitySpec)
        base.withColumn("sh",
          graft.functions.ArrayMath.sort_by_xxhash(col("toks")))
      else {
        // exact document frequency per token: a COUNT window over the
        // exploded token frame (r6 — the former groupBy(tok) + merge
        // self-join computed the same counts but exchanged the full
        // exploded frame TWICE, once into the aggregate and once into the
        // join probe; the window needs the tok exchange once and the
        // downstream (grp, id) re-group is unchanged). base is
        // materialized so the tokenize+merge aggregate runs ONCE
        // (it otherwise re-evaluates under every consumer branch).
        // collect_set on the re-group: (grp, id) is unique after the
        // guard above, so this is a plain reassembly.
        val matBase = graft.analytics.Materialize(base)
        val tok = matBase.select(col("grp"), col("id"),
          explode(col("toks")).as("tok"))
        val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
        tok.withColumn("df", count(lit(1)).over(wTok))
          .groupBy("grp", "id")
          .agg(transform(
            array_sort(collect_set(struct(col("df"), col("tok")))),
            s => s.getField("tok")).as("sh"))
      }
    // prefix length sz − ⌈t·sz⌉ + 1 with a 1e-9 slack inside the ceil:
    // pure binary-float arithmetic misrounds integer products (0.9·20 and
    // 1.0−0.9 both land off-integer), which would shorten the prefix by one
    // exactly at threshold boundaries and silently drop J = t pairs. The
    // slack can only LENGTHEN a prefix (recall-safe), never shorten it.
    // materialized ONCE: the ordered-set construction (split + distinct +
    // sort + prefix slice) otherwise re-evaluates in every consuming
    // branch — both sides of the token self-join and both verify joins
    // (the plan showed array_sort ×24 before this)
    val sets = orderedSets.select(col("grp"), col("id"), col("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
      .withColumn("prefix", slice(col("sh"), lit(1),
        (col("sz") - ceil(col("sz") * minJaccard - lit(1e-9)) + 1)
          .cast("int")))
      .transform(graft.analytics.Materialize.apply)
    // prefix-token candidates materialized partitioned+sorted on the join
    // keys: the self-join's two sides read ONE exploded, once-shuffled
    // frame (≈ (1−t)·|set|+1 narrow rows per doc) instead of each
    // re-exploding `sets` and re-exchanging on (grp, tok). `pos` is the
    // token's 0-based position in the ORDERED set (= its posexplode index
    // in the prefix, which is the set's head slice) — carried for the
    // positional filter below.
    val toks = graft.analytics.Materialize.partitionedBy(
      sets.select(col("grp"), col("id"), col("sz"),
        posexplode(col("prefix")).as(Seq("pos", "tok"))),
      col("grp"), col("tok"))
    // same slack on the size-ratio bound: |B| = t·|A| exactly must survive
    val sizeOk =
      col("x.sz").cast("double") >= lit(minJaccard) * col("y.sz") - 1e-9 &&
      col("y.sz").cast("double") >= lit(minJaccard) * col("x.sz") - 1e-9
    // PPJoin POSITIONAL filter (r6, lossless): for a shared token at
    // 0-based positions (pA, pB), overlap(a, b) ≤ (shared strictly before
    // it) + 1 + (tokens strictly after it in the shorter remainder)
    //   ≤ 0 + 1 + min(szA − pA − 1, szB − pB − 1) = min(szA − pA, szB − pB)
    // where "shared before = 0" holds for the pair's SMALLEST shared
    // token under the common order (any earlier shared token would be a
    // smaller one inside both prefixes — contradiction), so every true
    // pair survives through that minimal row even when its other
    // candidate rows are pruned. J ≥ t needs overlap ≥ t·(szA+szB)/(1+t);
    // the 1e-9 slack again only ADMITS extra candidates, never drops one.
    // Candidate rows failing the bound die BEFORE the distinct and the
    // two verify joins — on zipf text the early (rare) prefix slots carry
    // the surviving pairs and the deep slots of long sets stop generating
    // work.
    val posOk =
      least(col("x.sz") - col("x.pos"), col("y.sz") - col("y.pos"))
        .cast("double") >=
        lit(minJaccard / (1.0 + minJaccard)) * (col("x.sz") + col("y.sz")) -
          1e-9
    val cand = toks.as("x").join(toks.as("y").hint("merge"),
        col("x.grp") === col("y.grp") && col("x.tok") === col("y.tok") &&
          col("x.id") < col("y.id") && sizeOk && posOk)
      .select(col("x.grp").as("grp"), col("x.id").as("id_a"),
        col("y.id").as("id_b"))
      .distinct()
    // verify joins on (grp, id): ids may repeat across groups
    val verify = sets.select(col("grp"), col("id"), col("sh")).hint("merge")
    cand
      .join(verify.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("grp", "id_a"))
      .join(verify.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("grp", "id_b"))
      .withColumn("jaccard",
        graft.functions.ArrayMath.jaccard_sets(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("grp"), col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Scale path for [[jaccardWithinGroup]] when groups are NOT bounded
    * (a hot `source`/host group at 100 TB): candidates must share a MinHash
    * LSH band INSIDE the group, so the quadratic blow-up is bounded by band
    * bucket sizes instead of group sizes. Same exact-Jaccard verification;
    * recall follows the LSH S-curve (≥ ~99.5% at J ≥ 0.9 with 8 bands × 4
    * rows), so use the exact variant only where a group-size contract holds.
    */
  def jaccardWithinGroupLsh(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minJaccard: Double, shingleN: Int = 3,
      assumeUniqueIds: Boolean = false): DataFrame = {
    // materialized once: feeds both sides of the band self-join and both
    // verify joins (4× the shingle+minhash compute otherwise). The minhash
    // is computed over the per-(grp, id) MERGED set ([[mergedShingleSets]]
    // contract); for unique-id inputs this equals the per-row signature
    // (min over a multiset ignores duplicates), so the unique-input output
    // is byte-identical to the pre-guard operator.
    val sigs = mergedShingleSets(df, idCol, textCol, groupCol, shingleN,
        assumeUniqueIds)
      .withColumn("minhash", minhash_signature(col("sh"), NumHashes))
      .transform(graft.analytics.Materialize.apply)
    // candidate keys only through the band join + distinct (the heavy
    // shingle arrays join back per verified candidate, as in
    // minhashNearDups); the narrow banded frame is materialized
    // partitioned+sorted on the join keys so the self-join runs
    // exchange-free instead of re-deriving and re-shuffling it per side
    val banded = graft.analytics.Materialize.partitionedBy(
      sigs.select(col("grp"), col("id"), size(col("sh")).as("ssz"),
        explode(array((0 until Bands).map(bandKey): _*)).as("band_key")),
      col("grp"), col("band_key"))
    val sizeOk =
      col("x.ssz").cast("double") >= lit(minJaccard) * col("y.ssz") - 1e-9 &&
      col("y.ssz").cast("double") >= lit(minJaccard) * col("x.ssz") - 1e-9
    val pairs = banded.as("x").join(banded.as("y").hint("merge"),
        col("x.grp") === col("y.grp") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id") && sizeOk)
      .select(col("x.grp").as("grp"), col("x.id").as("id_a"),
        col("y.id").as("id_b"))
      .distinct()
    // verify joins on (grp, id): ids may repeat across groups
    val sets = sigs.select(col("grp"), col("id"), col("sh")).hint("merge")
    pairs
      .join(sets.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("grp", "id_a"))
      .join(sets.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("grp", "id_b"))
      .withColumn("jaccard",
        graft.functions.ArrayMath.jaccard_sets(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("grp"), col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- duplicate-cluster formation ----------------------------------------
  /** Connected components over near-dup candidate pairs — the step that
    * turns pairwise edges into the reference's duplicate clusters (its
    * corpus carries the result as `minhash_cluster_size`,
    * `fineweb/fineweb2_download.py:22`). Distributed min-label propagation:
    * every node adopts the minimum label among itself and its neighbors
    * until a fixpoint; `cluster_id` = min member id of the component.
    *
    * Scale shape: each iteration is a neighbor-min propagation (keyed join
    * + groupBy on node id — AQE coalesces) followed by a POINTER JUMP
    * (label := label(label), one self-join), which halves remaining label
    * distances — convergence in O(log component-diameter) iterations, so a
    * chain of 10^6 drifting duplicates resolves within ~20 rounds where
    * plain propagation would need 10^6. Lineage is cut with an eager
    * localCheckpoint per iteration (the plan does not grow with the
    * iteration count); superseded per-iteration checkpoints become
    * unreachable on reassignment and Spark's ContextCleaner unpersists
    * their blocks on GC, bounding resident copies.
    *
    * Throws IllegalStateException instead of returning a silent non-fixpoint
    * if `maxIter` is hit while labels are still moving.
    */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame =
    dupClustersWithStats(pairs, idA, idB, maxIter, checkpointDir)._1

  /** [[dupClusters]] returning also the number of propagate+jump iterations
    * it took to converge — the O(log diameter) bound made assertable
    * (DedupSpec pins a 10^4-node chain to ≲ 2·log₂ n iterations).
    *
    * `checkpointDir`: when set, per-iteration lineage cuts use RELIABLE
    * checkpoints in that directory instead of executor-memory
    * `localCheckpoint` — at 100-TB scale the labels don't fit (and must
    * survive) executor memory. When None, the cuts follow the global
    * [[graft.analytics.Materialize]] policy: in-memory by default, or the
    * session's reliable checkpoint store if
    * `spark.graft.checkpoint.reliable=true`.
    *
    * The per-iteration changed-label count is folded into the SAME job that
    * materializes the iteration's checkpoint (a LongAccumulator bumped by the
    * projection), not a second pass; task retries can only overcount, and at
    * the fixpoint nothing increments, so convergence detection stays exact.
    */
  def dupClustersWithStats(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25,
      checkpointDir: Option[String] = None): (DataFrame, Int) =
    graft.analytics.Materialize.withCheckpointDir(
        pairs.sparkSession, checkpointDir) {
      dupClustersLoop(pairs, idA, idB, maxIter, checkpointDir)
    }

  private def dupClustersLoop(pairs: DataFrame, idA: String,
      idB: String, maxIter: Int,
      checkpointDir: Option[String]): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    // Reliable mode persists before checkpointing so the eager count and
    // the file-write jobs share one computation — see Materialize.reliable
    // (a recompute here would also double every accumulator bump, reading
    // the changed-count ~2×).
    def cp(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) graft.analytics.Materialize.reliable(df)
      else graft.analytics.Materialize(df)
    val bi = cp(pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst"))))
    var labels = cp(bi.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // (1) adopt the minimum label among self and neighbors
      val nbr = bi.join(labels.withColumnRenamed("id", "src").hint("merge"),
          "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("nbr_label"))
      val propagated = cp(labels.join(nbr.hint("merge"), Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("mid_label"))) // materialize once: feeds both join sides
      // (2) pointer jump: label := label(label). Every label IS a node id
      // (labels start as ids and only ever take other nodes' labels) and
      // label(x) ≤ x, so the inner self-join is total and monotone.
      val parents = propagated
        .select(col("id").as("pid"), col("mid_label").as("plabel"))
      val acc = spark.sparkContext.longAccumulator(s"dupClusters.changed.$it")
      val touch = udf { chg: Boolean => if (chg) acc.add(1L); chg }
        .asNondeterministic() // never elide/dedup the accumulator bump
      val updated = cp(propagated.join(parents.hint("merge"),
          propagated("mid_label") === parents("pid"))
        .select(col("id"), col("plabel").as("new_label"),
          touch(col("plabel") < col("old_label")).as("__chg")))
      changed = acc.value // the cp() above already ran the counting job
      labels = updated.select(col("id"), col("new_label").as("label"))
      it += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"dupClusters did not reach a fixpoint in $maxIter iterations " +
        s"($changed labels still moving) — raise maxIter")
    (labels.select(col("id"), col("label").as("cluster_id")), it)
  }

  /** `dupClusters` + per-cluster size (the `minhash_cluster_size` column
    * shape) via one groupBy-join on cluster_id.
    */
  def withClusterSizes(clusters: DataFrame): DataFrame = {
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes.hint("merge"), "cluster_id")
      .select(col("id"), col("cluster_id"), col("cluster_size"))
  }

  // ---- embedding cosine near-dup ------------------------------------------
  /** Near-duplicate embedding pairs: random-hyperplane sign buckets (LSH for
    * cosine), exact cosine verification within buckets.
    *
    * `bucketCap` is the same OPT-IN mega-bucket skew guard as
    * [[minhashNearDups]]/[[simhashNearDups]]: an oversized sign bucket
    * (one template embedding replicated corpus-wide) is not expanded
    * all-pairs — members CHAIN in (emb, id) order (lexicographic array
    * order sorts near-identical vectors adjacent) plus a STAR to the
    * bucket's min-id member; every edge is exact-cosine-verified, so no
    * false merge is possible. Pair with [[embeddingNearDupsWithStats]] so
    * truncation is OBSERVED.
    *
    * `bands` is the recall dial (same amplification as minhash's banding):
    * `bands` independent sign bands of `planes` hyperplanes each — a pair
    * is a candidate if ANY band agrees on every plane, so recall at
    * per-plane agreement r = 1 − θ/π rises from r^planes to
    * 1 − (1 − r^planes)^bands, at the cost of a ×bands candidate budget
    * on uniform vectors. Band 0's planes are BY CONSTRUCTION the
    * single-band planes ([[graft.similarity.Ann.planeVec]] indexes one
    * global plane sequence, so the (bands·planes)-plane matrix's first
    * `planes` rows equal the single-band matrix), hence the banded
    * candidate set is a strict superset of the single-band one and
    * verification is identical — `bands > 1` can only add true pairs,
    * never lose one (DedupSpec pins the superset). The banded path
    * mirrors the minhash pairing shape: one materialized
    * `(id, bucket, bsz, bmin)` frame carries the operator's single
    * bucket-key shuffle (embeddings deliberately NOT exploded ×bands —
    * the verify joins read them back from the one-row-per-vector sigs
    * frame), and `bucketCap` applies per band with the same star/chain
    * guard.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
      minCosine: Double = 0.95, planes: Int = 12, dim: Int = 64,
      bucketCap: Int = Int.MaxValue, bands: Int = 1): DataFrame = {
    requireDial(bands, planes)
    if (bands == 1)
      embPairsFromBucketed(
        embBucketed(df, idCol, embCol, planes, dim), minCosine, bucketCap)
    else {
      val sigs = embSigs(df, idCol, embCol, bands, planes, dim)
      embPairsFromSizedBands(sigs,
        graft.analytics.Materialize.partitioned(
          sizedEmbBands(sigs, bands, planes)),
        minCosine, bucketCap)
    }
  }

  /** `bands`/`planes` must be ≥ 1: `bands = 0` would route to the banded
    * path and explode over an EMPTY band array — every row silently
    * dropped, zero pairs, an all-zero census — and `planes = 0` buckets
    * the whole corpus into one all-pairs cell. Both are dial typos, not
    * meaningful requests; fail loudly (the ≤ 63-bit upper bound lives in
    * [[embSigs]]).
    */
  private def requireDial(bands: Int, planes: Int): Unit = {
    require(bands >= 1, s"bands = $bands must be >= 1")
    require(planes >= 1, s"planes = $planes must be >= 1")
  }

  /** [[embeddingNearDups]] plus the eager truncation census (same
    * [[BucketStats]] contract and logging as the minhash twin).
    */
  def embeddingNearDupsWithStats(df: DataFrame, idCol: String,
      embCol: String, minCosine: Double = 0.95, planes: Int = 12,
      dim: Int = 64, bucketCap: Int = Int.MaxValue, bands: Int = 1)
      : (DataFrame, BucketStats) = {
    requireDial(bands, planes)
    if (bands == 1) {
      val withB = embBucketed(df, idCol, embCol, planes, dim)
      val stats = censusStats("embeddingNearDups", bucketCap, withB)
      (embPairsFromBucketed(withB, minCosine, bucketCap), stats)
    } else {
      val sigs = embSigs(df, idCol, embCol, bands, planes, dim)
      val sized = graft.analytics.Materialize.partitioned(
        sizedEmbBands(sigs, bands, planes))
      val stats = censusStats("embeddingNearDups", bucketCap, sized)
      (embPairsFromSizedBands(sigs, sized, minCosine, bucketCap), stats)
    }
  }

  /** One MATERIALIZED row per vector with the full (bands·planes)-bit sign
    * word — the single hyperplane pass shared by the banded explode and
    * both verify joins (one pass over the embedding matrix total; the
    * banded frame then carries only ids and bucket keys).
    */
  private def embSigs(df: DataFrame, idCol: String, embCol: String,
      bands: Int, planes: Int, dim: Int): DataFrame = {
    require(bands * planes <= 63,
      s"bands*planes = ${bands * planes} sign bits must fit one long")
    graft.analytics.Materialize(df.select(col(idCol).as("id"),
      col(embCol).as("emb"),
      graft.similarity.Ann.hyperplaneBucket(col(embCol), bands * planes, dim)
        .as("full")))
  }

  /** One row per (id, band bucket) with the bucket's size and min id — the
    * banded operator's ONE shuffle on the bucket key ([[sizedBands]] twin).
    * Band b's key is its `planes` sign bits tagged with the band index in
    * the bits ABOVE them, so bands never collide.
    */
  private def sizedEmbBands(sigs: DataFrame, bands: Int,
      planes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mask = (1L << planes) - 1L
    val banded = sigs.select(col("id"),
      explode(array((0 until bands).map(b =>
        shiftright(col("full"), b * planes).bitwiseAND(lit(mask))
          .bitwiseOR(lit(b.toLong << planes))): _*)).as("bucket"))
    val w = Window.partitionBy("bucket")
    banded
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min("id").over(w))
  }

  /** Banded pairing over a MATERIALIZED [[sizedEmbBands]] frame — the
    * [[pairsFromSized]] shape for embeddings: small-bucket self-join, mega
    * star, and mega chain (in (emb, id) order, vectors joined back for
    * capped rows only) produce DISTINCT candidate ids, then ONE exact
    * cosine verify join prices the work at the deduped candidate count
    * rather than once per band hit.
    */
  private def embPairsFromSizedBands(sigs: DataFrame, sized: DataFrame,
      minCosine: Double, bucketCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val smallSide = sized.filter(col("bsz") <= bucketCap)
      .select("id", "bucket")
    val allPairs = smallSide.as("x").join(smallSide.as("y").hint("merge"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val big = sized.filter(col("bsz") > bucketCap)
    val starPairs = big.filter(col("id") =!= col("bmin"))
      .select(col("bmin").as("id_a"), col("id").as("id_b"))
    val wOrd = Window.partitionBy("bucket").orderBy(col("emb"), col("id"))
    val chainPairs = big
      .join(sigs.select(col("id"), col("emb")).hint("merge"), "id")
      .withColumn("prev", lag("id", 1).over(wOrd))
      .filter(col("prev").isNotNull)
      .select(least(col("prev"), col("id")).as("id_a"),
        greatest(col("prev"), col("id")).as("id_b"))
    val pairs = allPairs.unionByName(starPairs).unionByName(chainPairs)
      .distinct()
    val embs = sigs.select(col("id"), col("emb")).hint("merge")
    pairs
      .join(embs.withColumnRenamed("id", "id_a")
        .withColumnRenamed("emb", "emb_a"), "id_a")
      .join(embs.withColumnRenamed("id", "id_b")
        .withColumnRenamed("emb", "emb_b"), "id_b")
      .withColumn("cosine",
        graft.similarity.Ann.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** One row per vector with its sign bucket, the bucket's size and min
    * id — materialized once, partitioned+sorted on the bucket key: the
    * self-join doesn't bucket every vector twice AND doesn't exchange the
    * (heavy — full embedding per row) frame once per side, and the census
    * reads the same frame. `bsim`-style inline star verification is NOT
    * carried here: a per-row copy of the representative's vector would
    * double the frame's width, so the star branch joins vectors back
    * instead (capped-bucket rows only).
    */
  private def embBucketed(df: DataFrame, idCol: String, embCol: String,
      planes: Int, dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sign = graft.similarity.Ann.hyperplaneBucket(col(embCol), planes, dim)
    val w = Window.partitionBy("bucket")
    graft.analytics.Materialize.partitioned(
      df.select(col(idCol).as("id"), col(embCol).as("emb"),
          sign.as("bucket"))
        .repartition(col("bucket"))
        .withColumn("bsz", count(lit(1)).over(w))
        .withColumn("bmin", min("id").over(w)))
  }

  private def embPairsFromBucketed(withB: DataFrame, minCosine: Double,
      bucketCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val small = withB.filter(col("bsz") <= bucketCap)
    val allPairs = small.as("x").join(small.as("y").hint("merge"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        graft.similarity.Ann.cosine(col("x.emb"), col("y.emb"))
          .as("cosine"))
    val big = withB.filter(col("bsz") > bucketCap)
    // star pairs verify via a join back to the vectors (bmin < id, so the
    // pair is already ordered); `withB` holds ONE row per vector — no
    // dedup needed on the join side
    val embs = withB.select(col("id"), col("emb")).hint("merge")
    val starPairs = big.filter(col("id") =!= col("bmin"))
      .select(col("bmin").as("id_a"), col("id").as("id_b"))
      .join(embs.withColumnRenamed("id", "id_a")
        .withColumnRenamed("emb", "emb_a"), "id_a")
      .join(embs.withColumnRenamed("id", "id_b")
        .withColumnRenamed("emb", "emb_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.similarity.Ann.cosine(col("emb_a"), col("emb_b"))
          .as("cosine"))
    // chain verifies inline: lag() hands the previous row's vector over
    val wOrd = Window.partitionBy("bucket").orderBy(col("emb"), col("id"))
    val chainPairs = big
      .withColumn("prev_id", lag("id", 1).over(wOrd))
      .withColumn("prev_emb", lag("emb", 1).over(wOrd))
      .filter(col("prev_id").isNotNull)
      .select(least(col("prev_id"), col("id")).as("id_a"),
        greatest(col("prev_id"), col("id")).as("id_b"),
        graft.similarity.Ann.cosine(col("prev_emb"), col("emb"))
          .as("cosine"))
    allPairs.unionByName(starPairs).unionByName(chainPairs)
      .distinct() // cosine is deterministic per pair
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
