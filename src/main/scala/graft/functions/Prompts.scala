package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X2 — prompt assembly, the reference's batched-inference input builder
  * (`fineweb/big_inference.py:131-137,171-207`): one COMMON chat template is
  * split at the first `%s` placeholder (`str.partition` semantics), each
  * document's text is truncated to a token budget, and the prompt is
  * `before + truncated_text + after`. The reference truncates in
  * tokenizer-token space; here the budget is whitespace tokens (the
  * engine-side analogue — the exact tokenizer is a model artifact, not an
  * engine semantic), applied as pure Catalyst expressions.
  */
object Prompts {

  /** `str.partition("%s")` — split at the FIRST placeholder; a template
    * without `%s` yields (template, "") exactly like Python's partition.
    */
  def splitTemplate(template: String): (String, String) = {
    val i = template.indexOf("%s")
    if (i < 0) (template, "")
    else (template.substring(0, i), template.substring(i + 2))
  }

  /** First `maxTokens` whitespace tokens of `text`, single-space rejoined
    * (columnar twin of the reference's `truncation=True` token budget).
    */
  def truncateTokens(text: Column, maxTokens: Int): Column =
    array_join(slice(split(text, " "), 1, maxTokens), " ")

  /** The assembled prompt column: before ∥ truncated text ∥ after. */
  def assemble(text: Column, template: String, maxTextTokens: Int): Column = {
    val (before, after) = splitTemplate(template)
    concat(lit(before), truncateTokens(text, maxTextTokens), lit(after))
  }
}
