package graft.stages

import java.util.regex.Pattern

/** Scalar engine for the N4 scrub, used inside the fused `mapPartitions`
  * scorer. Same compiled patterns and identical semantics as the Column
  * version ([[Scrub]], cross-validated in ScrubParitySpec): counts measured
  * on the ORIGINAL text, replacements applied sequentially
  * email → phone → slur → CNP.
  *
  * Perf: one String materialization per doc (vs one per regexp expression),
  * plus necessary-condition guards — '@' for emails, digits for phones/CNPs,
  * a lexicon-stem scan for slurs — that skip the regex entirely on the
  * (majority) clean docs.
  */
object ScrubScalar {

  final case class Result(
      scrubbed: String, nEmails: Int, nPhones: Int, nCnps: Int, nSlurs: Int)

  // The fast-path slur guard below scans for the literal "ule"; it is only
  // sound while every lexicon entry contains that substring (Romanian
  // vocative). Fail loudly at class-init if the lexicon ever diverges,
  // instead of silently skipping slurs the Column version still counts.
  require(graft.synth.Corpus.toxicLexicon.forall(_.toLowerCase.contains("ule")),
    "ScrubScalar slur guard assumes every toxicLexicon entry contains 'ule'; " +
      "update containsUleIgnoreCase before extending the lexicon")

  private val emailP = Pattern.compile(Scrub.emailRe)
  private val phoneP = Pattern.compile(Scrub.phoneRe)
  private val slurP = Pattern.compile(Scrub.slurRe)

  private def containsUleIgnoreCase(s: String): Boolean = {
    val n = s.length - 2
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c == 'u' || c == 'U') && {
        val l = s.charAt(i + 1); val e = s.charAt(i + 2)
        (l == 'l' || l == 'L') && (e == 'e' || e == 'E')
      }) return true
      i += 1
    }
    false
  }

  private def count(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  def apply(text: String): Result = {
    if (text == null || text.isEmpty) return Result(text, 0, 0, 0, 0)
    // one cheap scan for guard facts
    var hasAt = false
    var hasDigit = false
    var i = 0
    val n = text.length
    while (i < n && !(hasAt && hasDigit)) {
      val c = text.charAt(i)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      i += 1
    }
    // slur guard: all lexicon entries end in "ule" (vocative) — a fast
    // case-insensitive substring check; falls through to the real regex
    val maybeSlur = containsUleIgnoreCase(text)

    val nEmails = if (hasAt) count(emailP, text) else 0
    val nPhones = if (hasDigit) count(phoneP, text) else 0
    val nCnps = if (hasDigit) CnpScrubber.count(text) else 0
    val nSlurs = if (maybeSlur) count(slurP, text) else 0

    var out = text
    if (nEmails > 0) out = emailP.matcher(out).replaceAll(Scrub.EmailToken)
    if (nPhones > 0) out = phoneP.matcher(out).replaceAll(Scrub.PhoneToken)
    if (nSlurs > 0) out = slurP.matcher(out).replaceAll(Scrub.SlurToken)
    if (nCnps > 0) out = CnpScrubber.scrub(out)
    Result(out, nEmails, nPhones, nCnps, nSlurs)
  }
}
