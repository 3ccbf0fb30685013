package graft.ops

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Every gate is a pure function of (seed, row id) — `uniformDouble(
  * hash2(seed, id))` — so a sample is identical for any partitioning,
  * core count, or re-run, and DISJOINT seeds give independent samples
  * (the property a train/eval split needs). This is the same seeded-gate
  * discipline as the augmentation ops (SURVEY §2.8 U2) promoted to a
  * first-class operator family:
  *
  *  - [[bernoulli]]: flat rate over the corpus;
  *  - [[stratified]]: per-stratum rates — the DATA MIXER of an LLM
  *    corpus ("keep 100% of zh, 10% of en, 50% of everything else"),
  *    a narrow filter with no shuffle at any scale;
  *  - [[split]]: disjoint deterministic folds from one hash draw.
  */
object Sampling {

  /** `uniformDouble(hash2(seed, id))` as native columns: the seed half of
    * hash2 folds to a literal on the driver, the id half runs through the
    * codegen'd Mix64 expression, and the [0,1) projection is an exact
    * power-of-two division — bit-identical to the scalar kernel, with no
    * UDF boundary in a gate that evaluates once per corpus row.
    */
  private[ops] def gate(idCol: Column, seed: Long): Column = {
    val h = graft.functions.Mix64.mix64(lit(Hashing.mix64(seed)).bitwiseXOR(idCol))
    shiftrightunsigned(h, 11).cast("double") / lit((1L << 53).toDouble)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row draws `u = uniform(seed, id)` and keys on
    * `u^(1/w)`; the k largest keys are a weighted sample — a row's
    * inclusion probability is proportional to its weight, and the draw
    * is a pure function of (seed, id) so the sample is identical under
    * any partitioning. Rows with non-positive weight are excluded.
    *
    * Scale shape: the key is a narrow native-column projection; the
    * global top-k plans as TakeOrderedAndProject (per-partition bounded
    * top-k, driver merge of k·partitions rows) — no full sort, no
    * shuffle of the corpus. Keep k far below driver memory.
    */
  def weightedTopK(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val u = gate(col(idCol).cast("long"), seed)
    df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("samp_key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(desc("samp_key"), col(idCol))
      .limit(k)
  }

  /** Keep each row with probability `frac`, deterministically per id. */
  def bernoulli(df: DataFrame, idCol: String, frac: Double, seed: Long): DataFrame =
    df.filter(gate(col(idCol).cast("long"), seed) < frac)

  /** Per-stratum Bernoulli rates; strata not in `rates` use `defaultFrac`.
    * The rate lookup is a broadcast-free map literal in the plan (the
    * rates map is bounded: languages, sources, buckets).
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultFrac: Double,
      seed: Long): DataFrame = {
    val rate = rates.foldLeft(lit(defaultFrac)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(gate(col(idCol).cast("long"), seed) < rate)
  }

  /** Disjoint deterministic folds: `fractions` must sum to ≤ 1; row id
    * lands in fold i iff its uniform draw falls in fractions' i-th
    * half-open interval. One hash draw per row, zero overlap between
    * folds — the train/dev/test split shape.
    */
  def split(df: DataFrame, idCol: String, fractions: Seq[Double], seed: Long): Seq[DataFrame] = {
    require(fractions.sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val bounds = fractions.scanLeft(0.0)(_ + _)
    val u = gate(col(idCol).cast("long"), seed)
    fractions.indices.map(i => df.filter(u >= bounds(i) && u < bounds(i + 1)))
  }
}
