package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deterministic stratified sampling: exactness of the rate gates, run-to-
  * run stability, salt independence, and the zero-shuffle plan shape.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "stratum")
  }

  test("thresholdHex: edges and monotonicity") {
    assert(Sampling.thresholdHex(0.0) == "0")
    assert(Sampling.thresholdHex(-1.0) == "0")
    assert(Sampling.thresholdHex(1.0) == "g")
    assert(Sampling.thresholdHex(2.0) == "g")
    val ts = Seq(0.01, 0.1, 0.25, 0.5, 0.9, 0.999).map(Sampling.thresholdHex)
    assert(ts.forall(t => t.length == 15 && t.matches("[0-9a-f]{15}")))
    assert(ts == ts.sorted) // hex order = numeric order at equal length
  }

  test("rate 0 keeps nothing; rate 1 keeps everything; default applies") {
    val df = corpus(4000)
    val out = Sampling.stratifiedSample(df, "stratum", Seq("id"),
      Map("s0" -> 1.0, "s1" -> 0.0), defaultRate = 0.5, salt = "t")
    val by = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("s0") == 1000L)
    assert(!by.contains("s1"))
    // s2/s3 at the 0.5 default: binomial(1000, .5) — 4σ ≈ 63
    assert(math.abs(by("s2") - 500L) < 70)
    assert(math.abs(by("s3") - 500L) < 70)
  }

  test("same salt → identical row set across runs; new salt → a fresh draw") {
    val df = corpus(2000)
    def ids(salt: String) = Sampling.stratifiedSample(
      df, "stratum", Seq("id"), Map.empty, 0.3, salt)
      .select("id").collect().map(_.getLong(0)).toSet
    val a1 = ids("v1"); val a2 = ids("v1"); val b = ids("v2")
    assert(a1 == a2)
    assert(a1 != b)
    // independent draws overlap ≈ rate² of the corpus, not ≈ rate
    val overlap = (a1 & b).size.toDouble / 2000
    assert(overlap < 0.3 * 0.3 * 2.0)
  }

  test("the sample is a pure filter: no Exchange in the plan") {
    // string-match the rendered plan — SparkPlan.collect does not descend
    // into an unfinalised AdaptiveSparkPlan's subtree
    val plan = Sampling.stratifiedSample(corpus(100), "stratum", Seq("id"),
      Map("s0" -> 0.5), 0.1, "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected shuffle-free sampling plan, got:\n$plan")
  }

  test("rate accuracy at 20k rows (cryptographic uniformity)") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i.toLong, "only")).toDF("id", "stratum")
    val kept = Sampling.stratifiedSample(
      df, "stratum", Seq("id"), Map.empty, 0.3, "acc").count()
    // binomial(20000, .3): σ ≈ 65 → 4σ window
    assert(math.abs(kept - 6000L) < 260, s"kept=$kept")
  }

  test("budgetSelect: per-stratum cut is exact, ordered, deterministic") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 50L), ("a", 3L, 40L), ("a", 4L, 5L),
      ("b", 5L, 300L), ("c", 6L, 10L))
      .toDF("stratum", "id", "tokens")
    val out = Sampling.budgetSelect(df, "stratum", "tokens",
      budgets = Map("b" -> 0L), defaultBudget = 150L,
      orderCols = Seq(col("tokens").desc, col("id")))
      .select("id").collect().map(_.getLong(0)).toSet
    // a: 100 + 50 = 150 exactly exhausts (kept), 40 would overflow → {1,2};
    // b: budget 0 → nothing; c: 10 ≤ 150 → kept
    assert(out == Set(1L, 2L, 6L))
  }

  test("budgetSelect: a first doc larger than the budget empties the stratum") {
    import spark.implicits._
    val df = Seq(("a", 1L, 500L), ("a", 2L, 100L)).toDF("stratum", "id", "tokens")
    val out = Sampling.budgetSelect(df, "stratum", "tokens",
      Map.empty, 200L, Seq(col("tokens").desc, col("id")))
      .collect()
    // the 500-token doc sorts first and blows the budget; the 100-token doc
    // behind it is also excluded (cumulative 600) — the cut is a prefix of
    // the ORDER, not a knapsack
    assert(out.isEmpty)
  }

  test("budgetSelect plans exactly one hash exchange (the stratum key)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"s${i % 4}", i.toLong, 10L))
      .toDF("stratum", "id", "tokens")
    val plan = Sampling.budgetSelect(df, "stratum", "tokens",
      Map.empty, 50L, Seq(col("tokens").desc, col("id")))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1 && plan.contains("Exchange hashpartitioning(stratum"),
      s"expected exactly one stratum-key exchange, got:\n$plan")
  }

  test("multi-column keys change the coordinate (url+snapshot style)") {
    import spark.implicits._
    val df = Seq((1L, 1L, "s"), (1L, 2L, "s")).toDF("k1", "k2", "stratum")
    val coords = df.select(
      Sampling.coordinate(col("stratum"), Seq(col("k1"), col("k2")), "t"))
      .collect().map(_.getString(0))
    assert(coords.distinct.length == 2)
  }

  test("components cannot alias across boundaries (fixed-width blocks)") {
    import spark.implicits._
    // ("a|b", "c") vs ("a", "b|c"): a separator-joined coordinate would
    // collide; component-wise md5 blocks must not
    val df = Seq(("a|b", "c"), ("a", "b|c")).toDF("stratum", "k")
    val coords = df.select(
      Sampling.coordinate(col("stratum"), Seq(col("k")), "t"))
      .collect().map(_.getString(0))
    assert(coords.distinct.length == 2)
  }
}
