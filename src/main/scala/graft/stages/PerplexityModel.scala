package graft.stages

import graft.synth.Corpus

/** N2 — KenLM-style n-gram (bigram + unigram backoff) language model with
  * quantized log-probs, stored as flat arrays for cheap broadcast:
  * a word→id open-addressing hash table and a V×V bigram-membership bitset
  * (~8 KiB). Perplexity = exp(−mean log p), accumulated per-row in Float in
  * a fixed order ⇒ partition-invariant (FIXTURES.md §5 determinism).
  *
  * Replaces the reference's continuous quality `score` consumed by the
  * threshold filter (`small_model_inference/small_model_inference.py:40-95`,
  * filter at `small_model_inference/filter.py:22`) with a deterministic
  * from-scratch scorer, per the north rule.
  */
final class PerplexityModel(
    val vocab: Array[String],
    val bigramBits: Array[Long],
    val uniLogProb: Float,
    val chainLogProb: Float,
    val backoffLogProb: Float,
    val oovLogProb: Float
) extends Serializable {
  private val V = vocab.length
  // open addressing (linear probe) word→id table, 2x capacity, power of two
  private val cap: Int = Integer.highestOneBit(V * 4 - 1) << 1
  private val keys = new Array[String](cap)
  private val vals = new Array[Int](cap)
  locally {
    var i = 0
    while (i < V) {
      var h = vocab(i).hashCode & (cap - 1)
      while (keys(h) != null) h = (h + 1) & (cap - 1)
      keys(h) = vocab(i); vals(h) = i
      i += 1
    }
  }

  def wordId(w: String): Int = {
    var h = w.hashCode & (cap - 1)
    while (true) {
      val k = keys(h)
      if (k == null) return -1
      if (k == w || k.equals(w)) return vals(h)
      h = (h + 1) & (cap - 1)
    }
    -1
  }

  def hasBigram(w1: Int, w2: Int): Boolean = {
    val bit = w1 * V + w2
    (bigramBits(bit >>> 6) & (1L << (bit & 63))) != 0
  }

  /** Strip non-letter edges + lowercase — the LM's token normalization. */
  def normToken(raw: String): String = {
    var a = 0
    var b = raw.length
    while (a < b && !Character.isLetter(raw.charAt(a))) a += 1
    while (b > a && !Character.isLetter(raw.charAt(b - 1))) b -= 1
    if (a == 0 && b == raw.length) raw.toLowerCase
    else raw.substring(a, b).toLowerCase
  }

  /** Perplexity over whitespace tokens; empty/whitespace text gets the OOV
    * worst case (mirrors C6: degenerate inputs stay in-band, never throw).
    */
  def perplexity(text: String, maxTokens: Int = 2048): Double = {
    if (text == null) return math.exp(-oovLogProb)
    var sum = 0.0f
    var n = 0
    var prev = -1
    var i = 0
    val len = text.length
    while (i < len && n < maxTokens) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        val tok = normToken(text.substring(start, i))
        if (tok.nonEmpty) {
          val id = wordId(tok)
          val lp =
            if (id < 0) oovLogProb
            else if (prev < 0) uniLogProb
            else if (hasBigram(prev, id)) chainLogProb
            else backoffLogProb
          sum += lp
          n += 1
          prev = id
        }
      }
    }
    if (n == 0) math.exp(-oovLogProb) else math.exp(-(sum / n))
  }
}

object PerplexityModel {
  /** The committed model derived from the corpus bigram chain. */
  lazy val default: PerplexityModel = {
    val v = Corpus.roVocab
    val bits = new Array[Long]((v.length * v.length + 63) / 64)
    var i = 0
    while (i < v.length) {
      val succ = Corpus.successors(i)
      var j = 0
      while (j < succ.length) {
        val bit = i * v.length + succ(j)
        bits(bit >>> 6) |= 1L << (bit & 63)
        j += 1
      }
      i += 1
    }
    new PerplexityModel(v, bits, Corpus.uniLogProb, Corpus.chainLogProb,
      Corpus.backoffLogProb, Corpus.oovLogProb)
  }
}
