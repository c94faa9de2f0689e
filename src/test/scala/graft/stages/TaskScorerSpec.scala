package graft.stages

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Taxonomy
import graft.synth.SynthPages

/** Small-model multi-task record schema (c): per-task softmax + top-3
  * (class, prob) — semantics of `small_model_inference.py:77-93`.
  */
class TaskScorerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val texts = SynthPages.pages(TestSpark.spark, 64L)
    .collect().map(_.text)

  test("per-task probabilities form a simplex (sum 1, non-negative)") {
    val w = TaskScorer.default
    texts.foreach { t =>
      val ds = TaskScorer.scoreDoc(t, w)
      assert(ds.taskProbs.length == 3)
      ds.taskProbs.zip(TaskScorer.Tasks).foreach { case (probs, (name, labels)) =>
        assert(probs.length == labels.length, name)
        assert(probs.forall(_ >= 0.0), name)
        assert(math.abs(probs.sum - 1.0) < 1e-9, s"$name sum=${probs.sum}")
      }
    }
  }

  test("top-3 is prob-descending with index tiebreak; int_score = int(score)") {
    val w = TaskScorer.default
    texts.foreach { t =>
      val ds = TaskScorer.scoreDoc(t, w)
      assert(ds.score >= 0.0 && ds.score <= 5.0)
      assert(ds.intScore == ds.score.toInt)
      ds.taskProbs.foreach { probs =>
        val tk = TaskScorer.topK(probs, 3)
        assert(tk.length == math.min(3, probs.length))
        assert(tk.sliding(2).forall {
          case Array((i1, p1), (i2, p2)) => p1 > p2 || (p1 == p2 && i1 < i2)
          case _ => true
        })
        // top-1 really is the argmax
        assert(tk.head._2 == probs.max)
      }
    }
  }

  test("scoring is deterministic and the heads actually discriminate") {
    val w = TaskScorer.default
    val a = texts.map(t => TaskScorer.scoreDoc(t, w))
    val b = texts.map(t => TaskScorer.scoreDoc(t, w))
    a.zip(b).foreach { case (x, y) =>
      assert(x.score == y.score)
      x.taskProbs.zip(y.taskProbs).foreach { case (p, q) =>
        assert(p.sameElements(q))
      }
    }
    // different docs land on different top classes (heads are not constant)
    val top1Topics = a.map(d => TaskScorer.topK(d.taskProbs(0), 1).head._1)
    assert(top1Topics.distinct.length > 3,
      s"topic head is near-constant: ${top1Topics.distinct.toSeq}")
    val scores = a.map(_.intScore)
    assert(scores.distinct.length > 1, "regression head is constant")
  }

  test("distributed annotateRecords ≡ scalar record, labels from taxonomy") {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val recs = TaskScorer.annotateRecords(docs.toSeq.toDS())
      .collect().sortBy(_.doc_id)
    val w = TaskScorer.default
    docs.foreach { case (id, text) =>
      val expect = TaskScorer.record(id, text, w)
      assert(recs(id.toInt) == expect)
    }
    recs.foreach { r =>
      assert(Taxonomy.topics.contains(r.topic_class_1))
      assert(Taxonomy.formats.contains(r.format_class_1))
      assert(Taxonomy.ageGroups.contains(r.age_group_class_1))
      assert(r.topic_prob_1 >= r.topic_prob_2 && r.topic_prob_2 >= r.topic_prob_3)
      assert(r.age_group_prob_1 >= r.age_group_prob_2 &&
        r.age_group_prob_2 >= r.age_group_prob_3)
    }
  }

  test("TopK at k == number of classes emits the full sorted ranking") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TopK
    val probs = Array(0.05, 0.4, 0.1, 0.2, 0.15, 0.1)
    val out = Seq((1L, probs)).toDF("id", "probs")
      .select(col("id") +: TopK.topKClassColumns(col("probs"),
        Taxonomy.ageGroups, k = 6, "ag"): _*).head()
    val expect = TaskScorer.topK(probs, 6)
    (0 until 6).foreach { j =>
      assert(out.getString(1 + 2 * j) == Taxonomy.ageGroups(expect(j)._1))
    }
    // probs column is a descending permutation of the input
    val got = (0 until 6).map(j => out.getDouble(2 + 2 * j))
    assert(got.sorted.reverse == got)
    assert(got.sorted == probs.sorted.toSeq)
  }

  test("Column-side TopK extraction agrees with the scalar topK") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TopK
    val rows = Seq(
      (1L, Array(0.1, 0.5, 0.2, 0.05, 0.1, 0.05)),
      (2L, Array(0.3, 0.3, 0.1, 0.1, 0.1, 0.1)), // tie → lower idx first
      (3L, Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
    val df = rows.toDF("id", "probs")
    val out = df.select(col("id") +:
        TopK.topKClassColumns(col("probs"), Taxonomy.ageGroups, 3, "ag"): _*)
      .orderBy("id").collect()
    rows.foreach { case (id, probs) =>
      val expect = TaskScorer.topK(probs, 3)
      val r = out(id.toInt - 1)
      (0 until 3).foreach { j =>
        assert(r.getString(1 + 2 * j) == Taxonomy.ageGroups(expect(j)._1),
          s"id=$id j=$j")
        assert(math.abs(r.getDouble(2 + 2 * j) -
          math.rint(expect(j)._2 * 1e6) / 1e6) < 1e-9, s"id=$id j=$j")
      }
    }
  }
}
