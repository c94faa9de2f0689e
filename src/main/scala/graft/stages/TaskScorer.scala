package graft.stages

import org.apache.spark.sql.Dataset

import graft.model.Taxonomy
import graft.synth.Det

/** The reference's small-model multi-task inference record (schema (c)):
  * a regression quality score plus, for each secondary task
  * (topic / format / age_group), the top-3 (class, prob) pairs from a
  * softmax over the task's class logits —
  * `small_model_inference/small_model_inference.py:77-93` and the task
  * tables at `training/all_tasks_bert.py:97-107`.
  */
final case class SmallModelRecord(
    doc_id: Long,
    score: Double,
    int_score: Int,
    topic_class_1: String, topic_prob_1: Double,
    topic_class_2: String, topic_prob_2: Double,
    topic_class_3: String, topic_prob_3: Double,
    format_class_1: String, format_prob_1: Double,
    format_class_2: String, format_prob_2: Double,
    format_class_3: String, format_prob_3: Double,
    age_group_class_1: String, age_group_prob_1: Double,
    age_group_class_2: String, age_group_prob_2: Double,
    age_group_class_3: String, age_group_prob_3: Double
)

/** Deterministic multi-task scorer standing in for the reference's trained
  * BERT heads (`BertMultiTask`, `training/all_tasks_bert.py:110-150`): one
  * regression head (score ∈ [0,5], `int_score = int(score)` truncation as in
  * `small_model_inference.py:80-81`) and one linear softmax head per
  * secondary task over the closed taxonomies.
  *
  * The heads are linear models over the same hashed character-n-gram feature
  * space as [[LangIdModel]]; the weight tensors are committed deterministic
  * constants (splitmix64-seeded, quantized) — no training run, no I/O,
  * identical on every JVM. The north rule replaces neural trainers with
  * deterministic scorers; what must match the reference is the DATAFLOW:
  * batched per-partition inference, softmax over class logits, per-task
  * top-3 extraction into `{task}_class_{1..3}` / `{task}_prob_{1..3}`.
  */
object TaskScorer extends Serializable {
  val Bits = 14
  val NumBuckets: Int = 1 << Bits
  private val Mask = NumBuckets - 1
  val MinN = 2
  val MaxN = 4

  /** Context cap, mirroring the reference's 512-token truncation
    * (`small_model_inference.py:46`, tokenizer max_length).
    */
  val MaxChars = 2048

  private val HashSalt = 0x51ed2701a3b5c997L
  private val RegGain = 2000.0
  private val ClsGain = 800.0

  /** (task name, class labels) in the reference's task order
    * (`training/all_tasks_bert.py:97-101`).
    */
  val Tasks: Seq[(String, Seq[String])] = Seq(
    "topic" -> Taxonomy.topics,
    "format" -> Taxonomy.formats,
    "age_group" -> Taxonomy.ageGroups)

  /** reg: regression-head weights; tasks(t)(c): class-c weights of task t.
    * Total ≈ (1 + 24 + 24 + 6) × 2^14 floats ≈ 3.6 MB — broadcast once.
    *
    * `flatT` is the r6 hot-path layout: the same weights BUCKET-major
    * (row b = [reg(b), t0c0(b) … t2c5(b)], 55 floats). [[scoreDoc]]'s old
    * head-major loops read 55 scattered 64 KiB arrays at one bucket index
    * per gram — a cache miss per head per gram; the transposed row is a
    * couple of cache lines read once per gram. @transient lazy: broadcast
    * ships only reg/tasks, each executor JVM rebuilds the copy once. Per-
    * accumulator addition order is unchanged (gram order per head), so
    * every score/prob is bit-identical (TaskScorerSpec + the committed
    * golden pin it).
    */
  final class Weights private[TaskScorer] (
      val reg: Array[Float],
      val tasks: Array[Array[Array[Float]]])
    extends Serializable {
    @transient private[TaskScorer] lazy val width: Int =
      1 + tasks.map(_.length).sum
    @transient private[TaskScorer] lazy val flatT: Array[Float] = {
      val nb = reg.length
      val w = width
      val out = new Array[Float](nb * w)
      var b = 0
      while (b < nb) {
        var p = b * w
        out(p) = reg(b)
        p += 1
        var t = 0
        while (t < tasks.length) {
          val cls = tasks(t)
          var c = 0
          while (c < cls.length) { out(p) = cls(c)(b); p += 1; c += 1 }
          t += 1
        }
        b += 1
      }
      out
    }
  }

  /** Deterministic quantized weight vector for one head. */
  private def headWeights(salt: Long): Array[Float] = {
    val w = new Array[Float](NumBuckets)
    var b = 0
    while (b < NumBuckets) {
      val h = Det.mix64(salt ^ (b.toLong * 0x9e3779b97f4a7c15L))
      val raw = (((h & 0xffffL) - 32768L).toFloat / 32768.0f) / 8.0f
      w(b) = math.round(raw * 256.0f) / 256.0f // quantize: JVM-invariant
      b += 1
    }
    w
  }

  /** The committed weight tensors. Built once per JVM, broadcast by users. */
  lazy val default: Weights = {
    val reg = headWeights(0x5ecde7a11dL)
    val tasks = Tasks.zipWithIndex.map { case ((_, labels), t) =>
      labels.indices
        .map(c => headWeights((t + 1).toLong * 1000003L + c.toLong * 7919L))
        .toArray
    }.toArray
    new Weights(reg, tasks)
  }

  /** Hashed n-gram bucket stream — the shared [[Grams]] tokenization (one
    * definition with [[LangIdModel]]), under this scorer's salt and mask.
    */
  def gramBuckets(text: String): Array[Int] = {
    val ab = new scala.collection.mutable.ArrayBuilder.ofInt
    Grams.foreachBucket(text, MaxChars, MinN, MaxN, HashSalt, Mask.toLong)(
      ab += _)
    ab.result()
  }

  /** Numerically-stable softmax (the reference's `torch.softmax(dim=1)`). */
  def softmax(logits: Array[Double]): Array[Double] = {
    var m = logits(0)
    var i = 1
    while (i < logits.length) { if (logits(i) > m) m = logits(i); i += 1 }
    val e = new Array[Double](logits.length)
    var s = 0.0
    i = 0
    while (i < logits.length) { e(i) = math.exp(logits(i) - m); s += e(i); i += 1 }
    i = 0
    while (i < logits.length) { e(i) /= s; i += 1 }
    e
  }

  /** Top-k (classIdx, prob), prob desc with class-index tiebreak — the
    * deterministic equivalent of `torch.topk(probs, k)`
    * (`small_model_inference.py:88-90`).
    */
  def topK(probs: Array[Double], k: Int): Array[(Int, Double)] =
    probs.zipWithIndex
      .sortBy { case (p, i) => (-p, i) }
      .take(k)
      .map { case (p, i) => (i, p) }

  final case class DocScores(
      score: Double, intScore: Int, taskProbs: Array[Array[Double]])

  /** Scalar scoring of one document — the unit shared by the distributed
    * path and the spec's independent checks.
    */
  def scoreDoc(text: String, w: Weights): DocScores = {
    val bs = gramBuckets(text)
    val n = bs.length
    // ONE gram pass over the bucket-major weight rows: every head's
    // accumulator still receives its additions in gram order (double +=
    // the identical widened float), so all 55 sums — and every score and
    // prob derived from them — are bit-identical to the old head-major
    // 55-passes-over-the-gram-list loop, at ~a cache line per gram
    // instead of 55 scattered reads
    val width = w.width
    val flat = w.flatT
    val acc = new Array[Double](width)
    var i = 0
    while (i < n) {
      val base = bs(i) * width
      var k = 0
      while (k < width) { acc(k) += flat(base + k); k += 1 }
      i += 1
    }
    val regMean = if (n == 0) 0.0 else acc(0) / n
    // score ∈ [0,5]: the reference regression head is trained on 0-5
    // annotation scores (`training/all_tasks_bert.py:347-348`)
    val score = 5.0 / (1.0 + math.exp(-RegGain * regMean))
    var off = 1
    val taskProbs = w.tasks.map { classes =>
      val logits = new Array[Double](classes.length)
      var c = 0
      while (c < classes.length) {
        logits(c) = if (n == 0) 0.0 else ClsGain * acc(off + c) / n
        c += 1
      }
      off += classes.length
      softmax(logits)
    }
    DocScores(score, score.toInt, taskProbs)
  }

  /** One inference record (reference schema (c)). */
  def record(docId: Long, text: String, w: Weights): SmallModelRecord = {
    val ds = scoreDoc(text, w)
    val tk = Tasks.zipWithIndex.map { case ((_, labels), t) =>
      topK(ds.taskProbs(t), 3).map { case (ci, p) => (labels(ci), p) }
    }
    val Seq(tp, fm, ag) = tk
    SmallModelRecord(docId, ds.score, ds.intScore,
      tp(0)._1, tp(0)._2, tp(1)._1, tp(1)._2, tp(2)._1, tp(2)._2,
      fm(0)._1, fm(0)._2, fm(1)._1, fm(1)._2, fm(2)._1, fm(2)._2,
      ag(0)._1, ag(0)._2, ag(1)._1, ag(1)._2, ag(2)._1, ag(2)._2)
  }

  /** Distributed inference: (doc_id, text) → annotated records. Batched
    * `mapPartitions` with one broadcast deref per partition — the same
    * physical shape as the reference's per-shard batch loop
    * (`small_model_inference.py:46-66`). No shuffle.
    */
  def annotateRecords(docs: Dataset[(Long, String)]): Dataset[SmallModelRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(default)
    docs.mapPartitions { iter =>
      val w = bw.value
      iter.grouped(32).flatMap(_.map { case (id, text) => record(id, text, w) })
    }
  }
}
