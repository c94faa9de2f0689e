package graft.stages

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** N3 heuristics on hand-computed docs (FIXTURES.md `heuristics` family). */
class HeuristicsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def metrics(text: String): (Int, Double, Double, Double, Double) = {
    import spark.implicits._
    val df = Seq(text).toDF("text")
    val r = Heuristics.withHeuristics(df)
      .select("doc_len_words", "mean_word_len", "symbol_word_ratio",
        "stopword_frac", "dup_line_frac")
      .head()
    (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("doc_len_words and mean_word_len on a hand-computed doc") {
    val (n, mwl, _, _, _) = metrics("ab cde f\nghij")
    assert(n == 4)
    assert(math.abs(mwl - (2 + 3 + 1 + 4) / 4.0) < 1e-12)
  }

  test("empty and whitespace-only text is all zeros") {
    assert(metrics("") == ((0, 0.0, 0.0, 0.0, 0.0)))
    assert(metrics("   \n  \t ") == ((0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("symbol_word_ratio counts symbol chars per word") {
    val (_, _, ratio, _, _) = metrics("ab# cd@e fg hi")
    assert(math.abs(ratio - 2.0 / 4.0) < 1e-12)
  }

  test("stopword_frac matches Romanian stopword membership (case/punct-insensitive)") {
    // "și" and "De" are stopwords (2 of 4 words); trailing punctuation trimmed
    val (_, _, _, frac, _) = metrics("și De, carte universitate")
    assert(math.abs(frac - 0.5) < 1e-12)
  }

  test("dup_line_frac counts repeated non-blank lines") {
    val (_, _, _, _, dup) = metrics("unu doi\ntrei\nunu doi\n\nunu doi")
    // 4 non-blank lines, 2 distinct → 2/4 duplicated
    assert(math.abs(dup - 0.5) < 1e-12)
  }

  test("dup_line_frac is 0 for all-distinct lines") {
    val (_, _, _, _, dup) = metrics("a\nb\nc")
    assert(dup == 0.0)
  }
}
