package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Token-budget data mixing — the step between curation and training
  * that turns "we want 50% web, 30% books, 20% code" plus a global token
  * budget into per-source sampling rates and a concrete document sample.
  *
  * Where [[Sampling.stratified]] takes the per-stratum rates as GIVEN,
  * [[sampleToBudget]] DERIVES them from the corpus: each source `s` with
  * mixture weight `w_s` gets rate `min(1, budget * w_s / tokens_s)`, so
  * the expected token draw from `s` is `min(budget * w_s, tokens_s)` —
  * a source too small for its target share is taken whole (the standard
  * under-sampling behavior; upsampling is a repeat-epoch decision, not a
  * sampling one). Sources absent from `weights` are excluded (rate 0).
  *
  * Scale shape: one map-side-combined aggregation producing ONE ROW PER
  * SOURCE (the only collect — bounded by the source vocabulary, like the
  * CRF-transition and IVF-codebook collects), then a narrow seeded-gate
  * filter over the corpus. No data-sized shuffle, no window; the gate is
  * the same `uniformDouble(hash2(seed, id))` native-column discipline as
  * [[Sampling]], so the sample is identical under any partitioning.
  *
  * Token counting matches `q_docs_token_count` (single-space split of the
  * trimmed text) so the oracle can re-derive totals and rates in SQL.
  */
object Mixture {

  /** @return (idCol, sourceCol, n_tokens, rate) for sampled docs; `rate`
    *         is the derived per-source acceptance rate rounded to 6.
    */
  def sampleToBudget(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      weights: Map[String, Double],
      tokenBudget: Long,
      seed: Long): DataFrame = {
    val withTok = docs.select(
      col(idCol),
      col(sourceCol),
      size(split(trim(col(textCol)), " ")).cast("long").as("n_tokens"))
    val rates = derivedRates(withTok, sourceCol, weights, tokenBudget)
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    Sampling.stratified(withTok, idCol, sourceCol, rates, defaultFrac = 0.0, seed)
      .select(col(idCol), col(sourceCol), col("n_tokens"), round(rateCol, 6).as("rate"))
  }

  /** The bounded rate table: `source -> min(1, budget * w / total_tokens)`
    * for every source present in both the corpus and `weights`. Exposed so
    * callers (and tests) can inspect the mixture before sampling.
    */
  def derivedRates(
      withTok: DataFrame,
      sourceCol: String,
      weights: Map[String, Double],
      tokenBudget: Long): Map[String, Double] = {
    val totals: Map[String, Long] = withTok
      .groupBy(sourceCol).agg(sum("n_tokens").as("t"))
      .collect()
      .map { case Row(s: String, t: Long) => s -> t }
      .toMap
    totals.collect { case (s, t) if weights.contains(s) && t > 0L =>
      s -> math.min(1.0, tokenBudget * weights(s) / t)
    }
  }
}
