package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** X2 prompt assembly: str.partition("%s") semantics + token budget. */
class PromptsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("splitTemplate has python str.partition semantics") {
    assert(Prompts.splitTemplate("a %s b") == ("a ", " b"))
    assert(Prompts.splitTemplate("%s tail") == ("", " tail"))
    assert(Prompts.splitTemplate("head %s") == ("head ", ""))
    // FIRST placeholder only; later ones stay literal
    assert(Prompts.splitTemplate("a %s b %s c") == ("a ", " b %s c"))
    // no placeholder → (whole, "") exactly like str.partition
    assert(Prompts.splitTemplate("no placeholder") == ("no placeholder", ""))
  }

  test("assemble truncates to the token budget and concatenates exactly") {
    import spark.implicits._
    val df = Seq("unu doi trei patru cinci", "unu", "").toDF("text")
    val out = df.select(
        Prompts.assemble(col("text"), "P: %s :S", maxTextTokens = 3).as("p"))
      .collect().map(_.getString(0))
    assert(out(0) == "P: unu doi trei :S")
    assert(out(1) == "P: unu :S")
    assert(out(2) == "P:  :S") // empty text → empty middle, template intact
  }

  test("template without placeholder appends the text (partition semantics)") {
    // str.partition gives (whole, "", "") → before = template, after = "",
    // so before∥text∥after appends the text — exactly what the reference's
    // split_prompt + concat mechanism does with such a template
    import spark.implicits._
    val out = Seq("orice").toDF("text")
      .select(Prompts.assemble(col("text"), "static prompt ", 8).as("p"))
      .head().getString(0)
    assert(out == "static prompt orice")
  }
}
