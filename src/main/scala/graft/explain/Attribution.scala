package graft.explain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explainability surface — the engine analog of the reference's
  * per-position confidence/attribution table
  * (`/root/reference/model_explainability.py:209-218`, the only
  * non-rendering output of its explainability module): for every detected
  * mention, a ranked table of the features that produced it.
  *
  * The detector's emission contract (SURVEY §2.3 K2) makes the
  * attribution exact, not approximate: a mention exists because (1) a
  * gazetteer surface stamped 8.0 over its span, which (2) displaced the
  * 2.0 O-prior, and (3) the CRF transition chain B-T → I-T → … scored the
  * span's internal structure. Those are THE three features, emitted
  * ranked by contribution:
  *
  *   rank 1  `gazetteer:<surface>`     8.0 × span length
  *   rank 2  `o_prior_alternative`     2.0 × span length (the runner-up)
  *   rank 3  `crf_transition_chain`    logp(B-T→I-T) + (len−2)·logp(I-T→I-T),
  *                                     0 for single-char spans (no internal
  *                                     transitions)
  *
  * All weights are derived relationally from the mention table plus the
  * (vocabulary-bounded, broadcast) transition table — no kernel re-run,
  * no UDF, fully oracle-checkable in SQL.
  */
object Attribution {

  /** Per-mention ranked feature attributions.
    *
    * @param mentions    detected mentions (doc_id, span_idx, entity_type,
    *                    text, start, end, …)
    * @param transitions CRF transition table (from_label, to_label, logp)
    *                    — e.g. the `kg_crf_transitions` output; joined
    *                    twice by entity type and broadcast (≤ L² rows)
    * @return (doc_id, span_idx, entity_type, text, start, end, rank,
    *         feature, weight)
    */
  def attributions(mentions: DataFrame, transitions: DataFrame): DataFrame = {
    val t = transitions.select("from_label", "to_label", "logp")
    val bi = t
      .filter(col("from_label").like("B-%") &&
        col("to_label") === concat(lit("I-"), expr("substring(from_label, 3)")))
      .select(expr("substring(from_label, 3)").as("entity_type"), col("logp").as("logp_bi"))
    val ii = t
      .filter(col("from_label").like("I-%") && col("to_label") === col("from_label"))
      .select(expr("substring(from_label, 3)").as("entity_type"), col("logp").as("logp_ii"))

    val len = (col("end") - col("start")).cast("double")
    val chain = when(col("end") - col("start") === 1, lit(0.0))
      .otherwise(round(col("logp_bi") + (len - 2) * col("logp_ii"), 6))

    mentions
      .join(broadcast(bi), Seq("entity_type"), "left")
      .join(broadcast(ii), Seq("entity_type"), "left")
      .select(
        col("doc_id"), col("span_idx"), col("entity_type"), col("text"),
        col("start"), col("end"),
        posexplode(array(
          struct(concat(lit("gazetteer:"), col("text")).as("feature"),
            round(lit(8.0) * len, 6).as("weight")),
          struct(lit("o_prior_alternative").as("feature"),
            round(lit(2.0) * len, 6).as("weight")),
          struct(lit("crf_transition_chain").as("feature"),
            coalesce(chain, lit(0.0)).as("weight")))).as(Seq("pos", "f")))
      .select(
        col("doc_id"), col("span_idx"), col("entity_type"), col("text"),
        col("start"), col("end"),
        (col("pos") + 1).cast("int").as("rank"),
        col("f.feature").as("feature"),
        col("f.weight").as("weight"))
  }
}
