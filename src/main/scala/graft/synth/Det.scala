package graft.synth

/** Deterministic hash-based PRNG primitives (splitmix64 finalizer).
  *
  * Every synthetic value in tests/benchmarks is a pure function of
  * (seed, rowId, fieldName) — no `scala.util.Random`, no wall clock — so
  * fixtures are identical across partition counts and reruns (FIXTURES.md §5).
  */
object Det {
  /** splitmix64 finalizer — avalanches a 64-bit state. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hash(seed: Long, id: Long, field: String): Long = {
    var h = mix64(seed ^ 0x51afd6ed558ccd6dL)
    h = mix64(h ^ id)
    var i = 0
    while (i < field.length) { h = mix64(h ^ field.charAt(i).toLong); i += 1 }
    h
  }

  /** [[hash]] hoisted for per-(id, field) draw streams (r6 hot-path):
    * generators drawing many [[streamInt]] values for one (id, field)
    * re-hashed the field name per draw; hoist the base once and use
    * [[streamIntFrom]] — identical values by construction.
    */
  def streamBase(seed: Long, id: Long, field: String): Long =
    hash(seed, id, field)

  /** k-th draw from a hoisted [[streamBase]] — equals
    * `streamInt(seed, id, field, k, n)` exactly.
    */
  def streamIntFrom(base: Long, k: Int, n: Int): Int =
    (java.lang.Long.remainderUnsigned(
      mix64(base ^ (k.toLong * 0xd1b54a32d192ed03L)),
      n.toLong)).toInt

  /** Uniform int in [0, n). */
  def nextInt(seed: Long, id: Long, field: String, n: Int): Int =
    (java.lang.Long.remainderUnsigned(hash(seed, id, field), n.toLong)).toInt

  /** Uniform double in [0, 1). */
  def nextDouble(seed: Long, id: Long, field: String): Double =
    (hash(seed, id, field) >>> 11).toDouble / (1L << 53).toDouble

  /** Stateful-but-deterministic stream: k-th draw for one (id, field). */
  def streamInt(seed: Long, id: Long, field: String, k: Int, n: Int): Int =
    (java.lang.Long.remainderUnsigned(
      mix64(hash(seed, id, field) ^ (k.toLong * 0xd1b54a32d192ed03L)),
      n.toLong)).toInt

  /** The state [[hashString]] starts from before folding any chars —
    * shared with [[graft.stages.Grams]]'s prefix-extension hashing so the
    * two cannot drift.
    */
  def hashStringSeed(salt: Long): Long = mix64(salt ^ 0x27d4eb2f165667c5L)

  /** xxhash-style string hash used for n-gram features (not security). */
  def hashString(s: CharSequence, from: Int, until: Int, salt: Long): Long = {
    var h = hashStringSeed(salt)
    var i = from
    while (i < until) { h = mix64(h ^ s.charAt(i).toLong); i += 1 }
    h
  }
}
