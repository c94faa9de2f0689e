package graft.stages

import graft.synth.Det

/** THE character-n-gram tokenization shared by every hashed-feature scorer
  * ([[LangIdModel.rawScore]], [[LangIdModel.topLangs]],
  * [[TaskScorer.gramBuckets]]): lowercase, fold \n\t to space, cap at
  * maxChars, pad with one space on each side, then visit every n-gram for
  * n = minN..maxN. One definition — the scorers cannot desynchronize their
  * tokenization (each applies its own hash salt and bucket mask to the
  * visited spans).
  */
object Grams {
  /** Normalized, space-padded buffer ('\n'/'\t' → ' ', lowercased). */
  def normalize(text: String, maxChars: Int): java.lang.StringBuilder = {
    val len = math.min(text.length, maxChars)
    val sb = new java.lang.StringBuilder(len + 2)
    sb.append(' ')
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      sb.append(if (c == '\n' || c == '\t') ' ' else Character.toLowerCase(c))
      i += 1
    }
    sb.append(' ')
    sb
  }

  /** Visits the hashed bucket of every n-gram of the normalized text.
    * Returns the gram count. `f` receives `(hash(span) & mask).toInt`.
    */
  def foreachBucket(text: String, maxChars: Int, minN: Int, maxN: Int,
      salt: Long, mask: Long)(f: Int => Unit): Int = {
    if (text == null || text.isEmpty) return 0
    val sb = normalize(text, maxChars)
    val L = sb.length
    var count = 0
    var n = minN
    while (n <= maxN) {
      var j = 0
      while (j + n <= L) {
        f((Det.hashString(sb, j, j + n, salt) & mask).toInt)
        count += 1
        j += 1
      }
      n += 1
    }
    count
  }
}
