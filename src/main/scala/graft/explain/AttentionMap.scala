package graft.explain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine analog of the reference's mean-attention explainability output
  * (`/root/reference/model_explainability.py:73-77` — attention averaged
  * over layers/heads into one token×token matrix per sentence — and
  * `:146`, its per-token mean). SURVEY §2.6 A10.
  *
  * This engine's "attention" is the coupling structure the detector
  * actually uses, so the analog is exact rather than a heuristic read-out
  * of a black box: position i attends to position j iff they lie in the
  * same gazetteer-matched span (the span-shaped 8.0 emission evidence,
  * SURVEY §2.3 K2), and an O position attends only to itself with its
  * 2.0 O-prior. One deterministic "layer", already mean-reduced:
  *
  *   A[i][j] = 8.0  if some detected mention covers both i and j
  *   A[i][i] = 2.0  if position i is outside every mention
  *   A[i][j] = 0.0  otherwise
  *
  * Mentions never overlap (greedy longest-match detector), so each row's
  * mean over j has closed form: `8·len(m)/L` inside mention m, `2/L`
  * outside — which is what makes [[meanTokenAttention]] fully relational
  * and SQL-oracle-checkable.
  *
  * Scale shape: [[meanTokenAttention]] is token-granularity linear work —
  * two narrow explodes and one equi-join on (doc, span, pos) with partial
  * aggregation nowhere needed; a doc-id predicate pushes down to the
  * parquet scan. [[attentionMatrix]] is quadratic per sentence by
  * definition (seq_len² cells — the reference renders it for ONE sentence
  * at a time); callers scope it to an explained doc subset, which the
  * explode-based plan prunes before any join.
  */
object AttentionMap {

  /** One row per sentence position: `(doc_id, span_idx, pos, entity_type
    * ('O' outside mentions), mean_att)` where `mean_att` is the row mean
    * of the attention matrix, rounded to 6.
    *
    * @param sentences (doc_id, span_idx, text) — the detector's input rows
    * @param mentions  detected mentions (doc_id, span_idx, entity_type,
    *                  start, end, …)
    */
  def meanTokenAttention(sentences: DataFrame, mentions: DataFrame): DataFrame = {
    val positions = sentences
      .select(col("doc_id"), col("span_idx"), length(col("text")).as("len"))
      .select(col("doc_id"), col("span_idx"), col("len"),
        explode(sequence(lit(0), col("len") - 1)).as("pos"))
    val inMention = mentions.select(
      col("doc_id"), col("span_idx"), col("entity_type"),
      (col("end") - col("start")).as("mlen"),
      explode(sequence(col("start"), col("end") - 1)).as("pos"))
    positions
      .join(inMention, Seq("doc_id", "span_idx", "pos"), "left")
      .select(
        col("doc_id"), col("span_idx"), col("pos").cast("int").as("pos"),
        coalesce(col("entity_type"), lit("O")).as("entity_type"),
        round(coalesce(lit(8.0) * col("mlen"), lit(2.0)) / col("len"), 6).as("mean_att"))
  }

  /** The full per-sentence matrix, sparse form: only non-zero cells
    * `(doc_id, span_idx, i, j, att)`. Quadratic per sentence — scope
    * `sentences`/`mentions` to the docs being explained (the reference
    * explains a single sentence per call).
    */
  def attentionMatrix(sentences: DataFrame, mentions: DataFrame): DataFrame = {
    val span = mentions.select(
      col("doc_id"), col("span_idx"),
      col("start"), col("end"))
    val pairs = span
      .select(col("doc_id"), col("span_idx"), col("start"), col("end"),
        explode(sequence(col("start"), col("end") - 1)).as("i"))
      .select(col("doc_id"), col("span_idx"), col("i"),
        explode(sequence(col("start"), col("end") - 1)).as("j"),
        lit(8.0).as("att"))
    val oDiag = sentences
      .select(col("doc_id"), col("span_idx"), length(col("text")).as("len"))
      .select(col("doc_id"), col("span_idx"),
        explode(sequence(lit(0), col("len") - 1)).as("pos"))
      .join(mentions.select(col("doc_id"), col("span_idx"),
        (col("end") - col("start")).as("mlen"),
        explode(sequence(col("start"), col("end") - 1)).as("pos")),
        Seq("doc_id", "span_idx", "pos"), "left_anti")
      .select(col("doc_id"), col("span_idx"),
        col("pos").as("i"), col("pos").as("j"), lit(2.0).as("att"))
    pairs.unionByName(oDiag)
      .select(col("doc_id"), col("span_idx"),
        col("i").cast("int").as("i"), col("j").cast("int").as("j"), col("att"))
  }
}
