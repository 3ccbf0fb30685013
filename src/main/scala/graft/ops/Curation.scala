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
}
