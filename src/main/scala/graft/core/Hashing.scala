package graft.core

/** Deterministic, partition-order-independent hashing used for all
  * "randomness" in the engine (fixture generation, seeded sampling,
  * minhash permutations, embedding synthesis).
  *
  * The reference seeds torch/np (`train_enhanced.py:49-53`) but leaves the
  * global `random` module unseeded; we fix that design flaw by keying every
  * random decision on a hash of (stable id, op tag) so results never depend
  * on partition count, task order, or JVM identity hash.
  *
  * Uses the splitmix64 finalizer (public domain, Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14) over a
  * simple byte-stream mix. Not cryptographic; stable across JVMs.
  */
object Hashing {

  /** splitmix64 finalizer: a high-quality 64-bit mixer. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hash a string with a seed; stable across JVMs (iterates code points as
    * chars — sufficient for stability, we never need cross-language parity).
    */
  def hashString(s: String, seed: Long = 0L): Long = {
    var h = mix64(seed ^ 0xA0761D6478BD642FL)
    var i = 0
    while (i < s.length) {
      h = mix64(h ^ s.charAt(i).toLong)
      i += 1
    }
    mix64(h ^ s.length.toLong)
  }

  def hash2(a: Long, b: Long): Long = mix64(mix64(a) ^ b)

  /** Uniform double in [0, 1) from a hash. */
  def uniformDouble(h: Long): Double =
    (h >>> 11).toDouble / (1L << 53).toDouble

  /** Deterministic pick of an index in [0, n). */
  def pick(h: Long, n: Int): Int = {
    require(n > 0)
    val m = h % n
    (if (m < 0) m + n else m).toInt
  }

  /** 64-bit SimHash over whitespace tokens (kernel shared by
    * `ops.Dedup.simhash` and the native `functions.SimHash64` Catalyst
    * expression — which calls this from generated code, so it must stay a
    * plain static-forwardable object method).
    */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { t =>
      if (t.nonEmpty) {
        val h = hashString(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Word w-shingles of a text (lowercased, whitespace-split) — kernel
    * shared by `ops.Dedup` and the native MinHash expression.
    */
  def shingles(text: String, w: Int): Array[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) { if (toks.isEmpty) Array.empty else Array(toks.mkString(" ")) }
    else toks.sliding(w).map(_.mkString(" ")).toArray
  }

  /** k-permutation MinHash signature over word shingles (kernel shared by
    * `ops.Dedup.minhashSignature` and the native `functions.MinHashSig`
    * Catalyst expression — which calls this from generated code, so it
    * must stay a plain static-forwardable object method).
    */
  def minhashSignature(text: String, k: Int, w: Int): Array[Long] = {
    val sh = shingles(text, w)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = hashString(sh(i))
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (0x9E3779B97F4A7C15L * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Distinct 64-bit hashes of a text's word w-shingles, in one pass —
    * kernel of the native `functions.ShingleHashes` expression (static-
    * forwardable; called from generated code). The hash values are
    * internal to the inverted-index dedup operators (only equality
    * matters), so they use this library's own string hash.
    */
  def shingleHashes(text: String, w: Int): Array[Long] =
    shingleHashes(text, w, dedup = true)

  /** All (or distinct) shingle hashes: `dedup = false` keeps every
    * occurrence in order — the repetition-statistics operators need the
    * multiset, the membership/index operators the set.
    */
  def shingleHashes(text: String, w: Int, dedup: Boolean): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val seen = if (dedup) new java.util.HashSet[java.lang.Long]() else null
    val out = Array.newBuilder[Long]
    if (toks.isEmpty) return Array.empty
    if (toks.length < w) return Array(hashString(toks.mkString(" ")))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = hashString(sb.toString)
      if (seen == null || seen.add(h)) out += h
      i += 1
    }
    out.result()
  }

  /** Deterministic unit-ish embedding of dimension `dim` from a key.
    * Components in [-1, 1); used for synthetic lexicon/context embeddings.
    */
  def embedding(key: String, dim: Int, seed: Long = 0L): Array[Float] = {
    val base = hashString(key, seed)
    Array.tabulate(dim) { i =>
      (uniformDouble(mix64(base + i)) * 2.0 - 1.0).toFloat
    }
  }
}
