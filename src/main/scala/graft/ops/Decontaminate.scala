package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the eval-leakage guard of an LLM training
  * pipeline: drop every training document that shares at least one word
  * w-gram with a benchmark/eval set (the GPT-3-style n-gram overlap
  * rule; production pipelines use w of 8-13, the default here matches
  * the repo's other shingle ops).
  *
  * Scale shape: the BENCHMARK side is small by definition (an eval set),
  * so its distinct shingle-hash set broadcasts; the training side streams
  * through the codegen'd one-pass `ShingleHashes` expression and an
  * explode — the join carries 8-byte hashes, the corpus text never
  * shuffles, and the output of `contaminatedIds` is a tiny id set that
  * anti-joins back onto the corpus. No stage is quadratic and no state
  * outlives the query.
  */
object Decontaminate {

  private def shingleSet(df: DataFrame, textCol: String, idCol: String, w: Int): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      explode(graft.functions.ShingleHashes.shingle_hashes(
        coalesce(col(textCol), lit("")), w)).as("shingle"))

  /** Distinct ids of training docs sharing ≥1 w-gram with the benchmark. */
  def contaminatedIds(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 3): DataFrame = {
    val benchSh = broadcast(shingleSet(bench, textCol, idCol, w).select("shingle").distinct())
    shingleSet(train, textCol, idCol, w)
      .join(benchSh, Seq("shingle"))
      .select(col("doc_id").as(idCol))
      .distinct()
  }

  /** The surviving training corpus (all columns preserved). */
  def decontaminate(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 3): DataFrame =
    train.join(contaminatedIds(train, bench, textCol, idCol, w), Seq(idCol), "left_anti")

  /** Bloom-prefiltered [[contaminatedIds]] — same result, different scale
    * regime: when the benchmark suite is too large for its exact distinct
    * shingle set to broadcast (a few hundred MB of 8-byte hashes is the
    * practical ceiling), a FIXED-size Bloom filter (`mBits` bits,
    * regardless of benchmark size) is aggregated over the bench shingles,
    * collected once (bounded: `mBits/8` bytes — the same discipline as
    * the IVF codebook), and probes every train shingle as a codegen'd
    * scan-side filter. Only the ~fpp false-positive fraction plus the
    * true hits survive to the exact-verify equi-join, which therefore
    * shuffles a sliver of the corpus instead of all of it — while the
    * bench side's exact set never needs to fit on one executor. Because
    * Bloom "false" is definite absence and the verify join re-checks
    * every "true", the output is EXACTLY `contaminatedIds` — the oracle
    * for one is the oracle for the other.
    *
    * This is the engine-level form of the runtime bloom-filter join
    * pruning Spark itself applies to shuffle joins
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), made explicit
    * so it can cross the aggregate/scan boundary of the shingle explode.
    */
  def contaminatedIdsBloom(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 3,
      mBits: Int = 1 << 23,
      k: Int = 7): DataFrame = {
    import graft.functions.{BloomBuild, BloomMightContain, Mix64}
    val benchSh = shingleSet(bench, textCol, idCol, w).select("shingle").distinct()
    // BloomBuild hashes its input VALUES via AggHash (mix64 for longs);
    // the probe side passes the equivalent hash explicitly — raw shingle
    // in, mix64(shingle) probed.
    val bloom = benchSh
      .agg(BloomBuild.bloom_build(col("shingle"), mBits, k).as("bloom"))
      .head.getAs[Array[Byte]](0)
    shingleSet(train, textCol, idCol, w)
      .filter(BloomMightContain.bloom_might_contain(lit(bloom), Mix64.mix64(col("shingle"))))
      .join(benchSh, Seq("shingle"), "left_semi")
      .select(col("doc_id").as(idCol))
      .distinct()
  }
}
