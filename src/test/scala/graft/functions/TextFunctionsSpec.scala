package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Token counting: whitespace (X7) and the BPE-ish pretokenizer variant,
  * pinned against hand-counted expectations (the oracle checks corpus-level
  * aggregates; these pin the per-string semantics).
  */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def countBpe(s: String): Int = {
    import spark.implicits._
    Seq(s).toDF("text")
      .select(TextFunctions.tokenCountBpe(col("text")).as("n"))
      .head().getInt(0)
  }

  private def countWs(s: String): Int = {
    import spark.implicits._
    Seq(s).toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
      .head().getInt(0)
  }

  test("BPE-ish pretokenizer: letters, digits, punctuation split as GPT-2 does") {
    // "Ana are 12 mere!" → [Ana][ are][ 12][ mere][!]
    assert(countBpe("Ana are 12 mere!") == 5)
    // contraction suffix: "n'are" → [n]['][are]? No — 'a… only [sdmt]|ll|ve|re
    // match the suffix alternative: "don't" → [don]['t] = 2
    assert(countBpe("don't") == 2)
    // "we've they'll" → [we]['ve][ they]['ll] = 4
    assert(countBpe("we've they'll") == 4)
    // diacritics are \p{L}: "înțelegere școlară" → [înțelegere][ școlară] = 2
    assert(countBpe("înțelegere școlară") == 2)
    // mixed digit/letter boundary: "abc123" → [abc][123] = 2
    assert(countBpe("abc123") == 2)
    // punctuation run counts once: "wow!!!" → [wow][!!!] = 2
    assert(countBpe("wow!!!") == 2)
    // residual whitespace (trailing) is one token: "a  " → [a][  ] = 2
    assert(countBpe("a  ") == 2)
    assert(countBpe("") == 0)
  }

  test("whitespace token count ignores runs and leading/trailing space") {
    assert(countWs("ana  are\tmere") == 3)
    assert(countWs("  a b  ") == 2)
    assert(countWs("") == 0)
  }

  test("BPE-ish count ≥ whitespace count on natural text (finer splits)") {
    val texts = Seq("Ana are mere și pere.", "don't stop!",
      "preț: 12,50 lei (redus)")
    texts.foreach { t =>
      assert(countBpe(t) >= countWs(t), s"'$t'")
    }
  }
}
