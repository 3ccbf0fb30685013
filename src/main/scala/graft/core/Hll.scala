package graft.core

/** Deterministic HyperLogLog registers (Flajolet et al. 2007, with the
  * linear-counting small-range correction from the HLL++ paper's public
  * description) over this library's own 64-bit string hash — the
  * cardinality primitive a 100 TB pipeline needs where
  * `count(DISTINCT x)` would shuffle every distinct value: the sketch is
  * a fixed 2^p bytes per group, partial-aggregates map-side, and merges
  * by per-register max (associative + commutative, so the result is
  * bit-identical under any partitioning — which is exactly what the
  * driver oracle checks against a sequential replica).
  *
  * Kernel methods are static-forwardable plain object methods, shared by
  * the native [[graft.functions.HllDistinct]] aggregate and the Fixtures
  * replica (same discipline as [[Hashing.simhash64]] etc.).
  */
object Hll {

  /** 2^12 registers = 4 KiB per group, ~1.6% standard error. */
  val DefaultP: Int = 12

  def newRegisters(p: Int): Array[Byte] = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    new Array[Byte](1 << p)
  }

  /** Fold one 64-bit hash into the registers: index = top p bits, rank =
    * leading-zero count of the remaining bits + 1.
    */
  def add(regs: Array[Byte], h: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(regs.length)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def addString(regs: Array[Byte], s: String): Unit =
    add(regs, Hashing.hashString(s))

  /** Per-register max — the mergeable-sketch property. */
  def merge(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length, "register size mismatch")
    var i = 0
    while (i < into.length) {
      if (from(i) > into(i)) into(i) = from(i)
      i += 1
    }
  }

  /** Cardinality estimate: bias-corrected harmonic mean, switching to
    * linear counting in the small range (raw <= 2.5m with empty
    * registers). Deterministic: registers are summed in fixed order and
    * `pow(2, -r)` is exact in doubles.
    */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  def estimateLong(regs: Array[Byte]): Long = math.round(estimate(regs))
}
