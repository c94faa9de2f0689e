package graft.synth

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The DEDUP_SCALE corpus generator: deterministic, planted structure. */
class ScaleCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("generation is a pure function of (seed, id) — identical across " +
      "partitionings and reruns") {
    val a = ScaleCorpus.docs(spark, 500L, partitions = 3).collect()
      .sortBy(_.doc_id)
    val b = ScaleCorpus.docs(spark, 500L, partitions = 11).collect()
      .sortBy(_.doc_id)
    assert(a.length == 500 && b.length == 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.text == y.text && x.cluster == y.cluster && x.host == y.host)
      assert(x.embedding.sameElements(y.embedding))
    }
  }

  test("planted structure: zipf cluster head dominates; members are true " +
      "near-dups of their template; embeddings cohere within a cluster") {
    val docs = ScaleCorpus.docs(spark, 20000L).collect()
    val clustered = docs.filter(_.cluster >= 0)
    // ~30% clustered
    val frac = clustered.length.toDouble / docs.length
    assert(frac > 0.25 && frac < 0.35, s"clustered frac $frac")
    // zipf head: cluster 0 is the largest and holds ≥ 1% of clustered docs
    val sizes = clustered.groupBy(_.cluster).view.mapValues(_.length).toMap
    val maxCluster = sizes.maxBy(_._2)
    assert(maxCluster._1 == 0L, s"head cluster should dominate: $sizes")
    assert(maxCluster._2 >= clustered.length / 100)
    // near-dup bound: any two members of one cluster share word-set
    // J ≥ (L−4)/(L+4) (each perturbs ≤ 2 tokens of the shared template)
    val big = clustered.filter(_.cluster == maxCluster._1).take(20)
    val sets = big.map(_.text.split(" ").toSet)
    for (i <- sets.indices; j <- (i + 1) until sets.length) {
      val (si, sj) = (sets(i), sets(j))
      val jac = si.intersect(sj).size.toDouble / si.union(sj).size
      val l = math.max(si.size, sj.size).toDouble
      assert(jac >= (l - 4) / (l + 4) - 1e-9,
        s"members $i/$j jaccard $jac below the planted bound")
    }
    // pristine members (n_edits = 0) are EXACT duplicates
    val pristine = big.filter(_.n_edits == 0)
    assert(pristine.length >= 2, "fixture should contain pristine copies")
    assert(pristine.map(_.text).distinct.length == 1)
    // embeddings: same-cluster cosine ≥ 0.999, cross-content lower
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(big(0).embedding, big(1).embedding) >= 0.999)
    val unique = docs.filter(_.cluster < 0).take(2)
    assert(cos(unique(0).embedding, unique(1).embedding) < 0.999)
  }

  test("rare tokens: unique docs own df=1 tokens; cluster tokens shared " +
      "only within the cluster (the frequency-order prefix key)") {
    val docs = ScaleCorpus.docs(spark, 5000L).collect()
    val uniq = docs.filter(_.cluster < 0).take(50)
    uniq.foreach { d =>
      val rare = d.text.split(" ").filter(_.startsWith("u"))
      assert(rare.nonEmpty, s"unique doc ${d.doc_id} has no rare tokens")
      assert(rare.forall(_.startsWith("u" + d.doc_id + "x")),
        "rare tokens must be owned by the doc")
    }
    val byCluster = docs.filter(_.cluster >= 0).groupBy(_.cluster)
      .filter(_._2.length >= 2).take(5)
    byCluster.foreach { case (c, members) =>
      members.foreach { d =>
        val ct = d.text.split(" ").filter(_.startsWith("c"))
        assert(ct.nonEmpty && ct.forall(_.startsWith("c" + c + "x")),
          s"cluster $c member ${d.doc_id} carries foreign cluster tokens")
      }
    }
  }
}
