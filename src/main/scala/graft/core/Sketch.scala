package graft.core

/** Deterministic mergeable sketches beyond [[Hll]]: Bloom membership,
  * Count-Min frequency, and a DDSketch-style log-bucket quantile
  * histogram. Together with HLL these are the four summary primitives a
  * 100 TB pipeline leans on where the exact relational form (semi-join /
  * groupBy-count / sort-based percentile) would shuffle data-sized state:
  * each sketch is a fixed-size register block, partial-aggregates
  * map-side, and merges with an associative + commutative operation
  * (bitwise OR / elementwise add), so the result is **bit-identical under
  * any partitioning** — the property the driver oracle hard-checks
  * against sequential replicas in Fixtures.
  *
  * Everything is keyed on the library's own [[Hashing]] (splitmix64
  * family) and uses `StrictMath` where floating point is involved, so
  * sketches are reproducible across JVMs and platforms.
  *
  * All kernel methods are static-forwardable plain object methods — the
  * discipline that lets native Catalyst aggregates/expressions call them
  * from generated or interpreted code AND lets Fixtures replay them in a
  * driver-side loop.
  */
object Bloom {

  /** Bits for an expected `n` keys at false-positive rate `fpp`, rounded
    * up to a whole number of 64-bit words: m = -n ln(fpp) / (ln 2)^2.
    */
  def optimalBits(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0.0 && fpp < 1.0, s"need n>0, 0<fpp<1; got n=$n fpp=$fpp")
    val m = math.ceil(-n * StrictMath.log(fpp) / (StrictMath.log(2.0) * StrictMath.log(2.0)))
    val words = math.max(1L, (m.toLong + 63) / 64)
    require(words <= (Int.MaxValue / 64).toLong, s"bloom too large: $m bits")
    (words * 64).toInt
  }

  /** Probe count for m bits / n keys: k = (m/n) ln 2, clamped to [1,30]. */
  def optimalK(mBits: Int, n: Long): Int = {
    val k = math.round(mBits.toDouble / n * StrictMath.log(2.0)).toInt
    math.max(1, math.min(30, k))
  }

  /** Empty filter: word 0 is a header carrying k (probe count) so the
    * serialized sketch is self-describing; bits start at word 1.
    */
  def create(mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 30, s"k must be in [1,30], got $k")
    val a = new Array[Long](1 + mBits / 64)
    a(0) = k.toLong
    a
  }

  def kOf(bloom: Array[Long]): Int = bloom(0).toInt
  def bitsOf(bloom: Array[Long]): Int = (bloom.length - 1) * 64

  /** Kirsch-Mitzenmacher double hashing: probe i uses h1 + i*h2 where h2
    * is forced odd — deterministic, no per-probe rehash of the key.
    */
  def add(bloom: Array[Long], h: Long): Unit = {
    val m = bitsOf(bloom)
    val k = kOf(bloom)
    val h2 = Hashing.mix64(h) | 1L
    var i = 0
    var probe = h
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(probe, m.toLong).toInt
      bloom(1 + (bit >>> 6)) |= (1L << (bit & 63))
      probe += h2
      i += 1
    }
  }

  def mightContain(bloom: Array[Long], h: Long): Boolean = {
    val m = bitsOf(bloom)
    val k = kOf(bloom)
    val h2 = Hashing.mix64(h) | 1L
    var i = 0
    var probe = h
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(probe, m.toLong).toInt
      if ((bloom(1 + (bit >>> 6)) & (1L << (bit & 63))) == 0L) return false
      probe += h2
      i += 1
    }
    true
  }

  /** Bitwise OR — associative, commutative, idempotent. */
  def merge(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length && into(0) == from(0),
      s"bloom shape mismatch: ${into.length}w/k=${into(0)} vs ${from.length}w/k=${from(0)}")
    var i = 1
    while (i < into.length) { into(i) |= from(i); i += 1 }
  }

  def toBytes(bloom: Array[Long]): Array[Byte] = Sketch.longsToBytes(bloom)
  def fromBytes(bytes: Array[Byte]): Array[Long] = Sketch.bytesToLongs(bytes)

  /** Membership probe straight on the serialized form (what a scalar
    * expression holds after the aggregate's eval).
    */
  def mightContainBytes(bytes: Array[Byte], h: Long): Boolean =
    mightContain(fromBytes(bytes), h)

  private val probeCache = new ThreadLocal[(Array[Byte], Array[Long])]

  /** Probe with a per-thread deserialization memo: when the same byte
    * array object (a plan literal / broadcast value) probes every row,
    * the words unpack once per task instead of once per row. Static-
    * forwardable — called from generated code.
    */
  def mightContainCached(bytes: Array[Byte], h: Long): Boolean = {
    val c = probeCache.get()
    val words =
      if (c != null && (c._1 eq bytes)) c._2
      else { val w = fromBytes(bytes); probeCache.set((bytes, w)); w }
    mightContain(words, h)
  }
}

/** Count-Min sketch (Cormode & Muthukrishnan 2005): `d` rows of `w`
  * counters; update adds 1 to one counter per row, estimate is the min
  * over rows (always an over-estimate, within eps·N with probability
  * 1-delta for w=ceil(e/eps), d=ceil(ln 1/delta)). Merge is elementwise
  * add — exact, so the distributed sketch equals the sequential one
  * bit-for-bit.
  */
object CountMin {

  val DefaultDepth = 5
  val DefaultWidth = 2048

  /** Layout: [0]=d, [1]=w, then d*w counters row-major. */
  def create(d: Int, w: Int): Array[Long] = {
    require(d >= 1 && d <= 16, s"depth must be in [1,16], got $d")
    require(w >= 16, s"width must be >= 16, got $w")
    val a = new Array[Long](2 + d * w)
    a(0) = d.toLong
    a(1) = w.toLong
    a
  }

  private def cell(a: Array[Long], row: Int, h: Long): Int = {
    val w = a(1).toInt
    val hr = Hashing.mix64(h ^ (0xC2B2AE3D27D4EB4FL * (row + 1)))
    2 + row * w + java.lang.Long.remainderUnsigned(hr, w.toLong).toInt
  }

  def add(a: Array[Long], h: Long, n: Long = 1L): Unit = {
    val d = a(0).toInt
    var r = 0
    while (r < d) { a(cell(a, r, h)) += n; r += 1 }
  }

  def estimate(a: Array[Long], h: Long): Long = {
    val d = a(0).toInt
    var est = Long.MaxValue
    var r = 0
    while (r < d) { val c = a(cell(a, r, h)); if (c < est) est = c; r += 1 }
    est
  }

  /** Elementwise add — associative + commutative. */
  def merge(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length && into(0) == from(0) && into(1) == from(1),
      "count-min shape mismatch")
    var i = 2
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  def toBytes(a: Array[Long]): Array[Byte] = Sketch.longsToBytes(a)
  def fromBytes(bytes: Array[Byte]): Array[Long] = Sketch.bytesToLongs(bytes)

  def estimateBytes(bytes: Array[Byte], h: Long): Long =
    estimate(fromBytes(bytes), h)

  private val probeCache = new ThreadLocal[(Array[Byte], Array[Long])]

  /** Estimate with the same per-thread deserialization memo as
    * [[Bloom.mightContainCached]]. Static-forwardable.
    */
  def estimateCached(bytes: Array[Byte], h: Long): Long = {
    val c = probeCache.get()
    val counters =
      if (c != null && (c._1 eq bytes)) c._2
      else { val w = fromBytes(bytes); probeCache.set((bytes, w)); w }
    estimate(counters, h)
  }
}

/** DDSketch-style relative-error quantile histogram (Masson, Rim & Lee,
  * "DDSketch: a fast and fully-mergeable quantile sketch with
  * relative-error guarantees", VLDB 2019) over non-negative longs, with
  * fixed (non-collapsing) log-gamma buckets so merge is plain elementwise
  * add and the sketch is deterministic under any partitioning.
  *
  * bucket(v) = ceil(log_gamma(v)) for v >= 1, gamma = (1+alpha)/(1-alpha);
  * values <= 0 land in a dedicated zero-bucket. The quantile estimate
  * returns the bucket's geometric midpoint 2·gamma^i/(gamma+1), which is
  * within relative error alpha of the true quantile value. All float math
  * is StrictMath — bit-reproducible across JVMs.
  */
object DdHist {

  /** 1% relative error → gamma ≈ 1.0202; 2^63 needs ~2184 buckets. */
  val DefaultAlpha = 0.01

  def gammaOf(alpha: Double): Double = (1.0 + alpha) / (1.0 - alpha)

  def bucketCount(alpha: Double): Int = {
    val g = gammaOf(alpha)
    // enough buckets for any positive long (log_gamma(2^63)) + zero-bucket
    (StrictMath.log(StrictMath.pow(2.0, 63.0)) / StrictMath.log(g)).toInt + 3
  }

  /** Layout: [0] = zero-or-less count, [1..] = log buckets (index i holds
    * values v with ceil(log_gamma(v)) == i-1; v=1 → bucket index 1).
    */
  def create(alpha: Double): Array[Long] = new Array[Long](1 + bucketCount(alpha))

  def bucketOf(alpha: Double, v: Long): Int = {
    if (v <= 0L) 0
    else {
      val g = StrictMath.log(gammaOf(alpha))
      val b = StrictMath.ceil(StrictMath.log(v.toDouble) / g).toInt
      1 + math.max(0, b)
    }
  }

  def add(a: Array[Long], alpha: Double, v: Long): Unit =
    a(math.min(a.length - 1, bucketOf(alpha, v))) += 1L

  def merge(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length, "ddhist shape mismatch")
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  /** Value estimate at quantile q (0 <= q <= 1): the bucket holding the
    * ceil(q·n)-th value (1-indexed, q=0 → first); zero-bucket → 0.0,
    * else the geometric midpoint of the bucket's value range.
    */
  def quantile(a: Array[Long], alpha: Double, q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    var n = 0L
    var i = 0
    while (i < a.length) { n += a(i); i += 1 }
    if (n == 0L) return Double.NaN
    val rank = math.max(1L, StrictMath.ceil(q * n).toLong)
    var cum = 0L
    i = 0
    while (i < a.length) {
      cum += a(i)
      if (cum >= rank) {
        if (i == 0) return 0.0
        val g = gammaOf(alpha)
        // bucket i-1 covers (gamma^(b-1), gamma^b]; geometric midpoint
        val b = (i - 1).toDouble
        return 2.0 * StrictMath.pow(g, b) / (g + 1.0)
      }
      i += 1
    }
    Double.NaN // unreachable: cum == n >= rank by the loop end
  }

  def toBytes(a: Array[Long]): Array[Byte] = Sketch.longsToBytes(a)
  def fromBytes(bytes: Array[Byte]): Array[Long] = Sketch.bytesToLongs(bytes)
}

/** Shared little-endian (de)serialization for long-register sketches. */
object Sketch {
  def longsToBytes(a: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(a)
    bb.array()
  }

  def bytesToLongs(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, s"sketch bytes not a multiple of 8: ${bytes.length}")
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }
}
