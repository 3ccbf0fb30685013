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
}
