package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation funnel — the operators of this package
  * chained the way a training-data pipeline actually runs them:
  *
  *   1. normalization-aware exact dedup (min-id survivor per
  *      case/whitespace-normalized text);
  *   2. language filter on the PREDICTED language (n-gram langid, not a
  *      trusted metadata column);
  *   3. quality threshold on the composite score (rounded at 4, the
  *      cross-engine-stable comparison);
  *   4. per-language stratified sampling (seeded per-id gate).
  *
  * Every stage is a narrow filter or a partial-agg dedup — the funnel
  * adds NO shuffle beyond the dedup aggregation, so it runs at corpus
  * scale as one pass. Deterministic end to end (hash gates, no RNG
  * state), so the kept set is reproducible and oracle-checkable
  * (q_docs_curation).
  */
object Curation {

  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      allowedLangs: Set[String],
      minQuality: Double,
      sampleRates: Map[String, Double],
      defaultRate: Double,
      seed: Long): DataFrame = {
    val withNorm = docs.withColumn("__norm", TextAnalysis.normalizeText(col(textCol)))
    val survivors = Dedup.dropExactDuplicates(withNorm, "__norm", idCol).drop("__norm")
    val withLang = survivors
      .withColumn("__lang", TextAnalysis.languageIdCol(col(textCol)))
      .filter(col("__lang").isInCollection(allowedLangs))
    val qualified = TextAnalysis.qualityFeatures(withLang, col(textCol))
      .filter(round(col("quality_score"), 4) >= minQuality)
    Sampling.stratified(qualified, idCol, "__lang", sampleRates, defaultRate, seed)
      .select(col(idCol))
  }

  /** The FULL modern curation recipe (r4): [[curate]]'s four stages plus
    * the three guards a production pre-training pipeline adds —
    *
    *   1. normalized exact dedup;
    *   2. benchmark DECONTAMINATION (any shared word w-gram with the
    *      eval set drops the doc — including the eval docs themselves);
    *   3. predicted-language filter;
    *   4. quality threshold;
    *   5. REPETITION filter (top word-2-gram fraction ≤ cap);
    *   6. per-language stratified sampling;
    *   7. PII REDACTION on the surviving text.
    *
    * Still one logical pass: narrow filters + partial-agg dedup + the
    * broadcast decontamination join + one bounded (doc, gram) count for
    * the repetition stage. Deterministic and oracle-checkable end to end
    * (q_docs_curation_full).
    *
    * @return (idCol, text_redacted) for the kept docs
    */
  def curateFull(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      allowedLangs: Set[String],
      minQuality: Double,
      maxTopGramFrac: Double,
      sampleRates: Map[String, Double],
      defaultRate: Double,
      seed: Long,
      shingleW: Int = 3): DataFrame = {
    val withNorm = docs.withColumn("__norm", TextAnalysis.normalizeText(col(textCol)))
    val deduped = Dedup.dropExactDuplicates(withNorm, "__norm", idCol).drop("__norm")
    val clean = Decontaminate.decontaminate(deduped, bench, textCol, idCol, shingleW)
    val withLang = clean
      .withColumn("__lang", TextAnalysis.languageIdCol(col(textCol)))
      .filter(col("__lang").isInCollection(allowedLangs))
    val qualified = TextAnalysis.qualityFeatures(withLang, col(textCol))
      .filter(round(col("quality_score"), 4) >= minQuality)
    val lowRep = qualified.join(
      TextAnalysis.repetitionStats(qualified, textCol, idCol, w = 2)
        .filter(col("top_gram_frac") <= maxTopGramFrac)
        .select(col(idCol)),
      Seq(idCol))
    Sampling.stratified(lowRep, idCol, "__lang", sampleRates, defaultRate, seed)
      .select(col(idCol), TextAnalysis.redactPiiCol(col(textCol)).as("text_redacted"))
  }
}
