package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative softmax + per-row top-k class extraction over an
  * `array<double>` logits/probs column — the Column twin of
  * [[graft.stages.TaskScorer]]'s scalar path, used where the scores are
  * already columns (W1 per-row top-k, reference
  * `small_model_inference.py:84-93`). Pure Catalyst expressions.
  */
object TopK {

  /** Numerically-stable softmax over an array<double> column. */
  def softmaxArr(logits: Column): Column = {
    val m = array_max(logits)
    val e = transform(logits, x => exp(x - m))
    val s = aggregate(e, lit(0.0), (acc, v) => acc + v)
    transform(e, x => x / s)
  }

  /** 2k columns `{prefix}_class_j` / `{prefix}_prob_j` (j = 1..k) from a
    * probs array: prob desc, class-index tiebreak — sorted via an
    * array_sort over (−prob, idx) structs (lexicographic struct ordering),
    * no shuffle, no UDF.
    */
  def topKClassColumns(probs: Column, labels: Seq[String], k: Int,
      prefix: String): Seq[Column] = {
    val entries = transform(probs,
      (p, i) => struct((p * -1.0).as("negp"), i.as("idx")))
    val sorted = array_sort(entries)
    (1 to k).flatMap { j =>
      val e = element_at(sorted, j)
      Seq(
        element_at(typedlit(labels), e.getField("idx") + 1)
          .as(s"${prefix}_class_$j"),
        round(e.getField("negp") * -1.0, 6).as(s"${prefix}_prob_$j"))
    }
  }
}
