package graft.core

/** Core data model for the Spark-native medical KG-construction engine.
  *
  * Shapes derive from the reference corpus conventions
  * (`/root/reference/utils.py:27-49` BIO reader, `predict_enhanced.py:300-331`
  * entity/prediction records) and the authoritative input table shape in
  * `BASELINE.json` `input_hint`:
  *
  *   docs(doc_id: string,
  *        spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)
  *
  * All classes are plain case classes so Spark derives Catalyst
  * `ExpressionEncoder`s for them (typed `Dataset[T]` everywhere).
  */

/** One interleaved span of a document: `kind` is "text" or a media kind
  * ("image", "audio", ...). Text spans carry one clinical sentence (the
  * analog of one reference BIO sentence, `utils.py:27-49`); media spans
  * carry a `media_ref` and empty text. `offset` is the span's position in
  * the document — the per-row invariant vs the reference is span-sequence
  * equality on (kind, text, media_ref, order).
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An interleaved text+media document — one row of the primary input table. */
case class Doc(doc_id: String, spans: Seq[Span])

/** One text sentence exploded out of a document; `span_idx` preserves the
  * position of the originating span so the span sequence can be
  * reconstructed (order invariant).
  */
case class Sentence(doc_id: String, span_idx: Int, text: String)

/** A detected entity mention.
  *
  * `start`/`end` are half-open character offsets over kept tokens, matching
  * the reference's running-length offsets (`predict_enhanced.py:300-310`).
  * `text` has passed `cleanEntityName` (`utils.py:101-123`).
  */
case class Mention(
    doc_id: String,
    span_idx: Int,
    entity_type: String,
    text: String,
    start: Int,
    end: Int,
    confidence: Double)

/** A gold-tagged sentence (reference BIO corpus row): parallel char/tag
  * arrays, one sentence per blank-line-separated block (`utils.py:27-49`).
  */
case class TaggedSentence(
    doc_id: String,
    span_idx: Int,
    chars: Seq[String],
    tags: Seq[String])

/** UMLS-style lexicon row for entity linking. Embedding is a small dense
  * vector used by the dot-product link scorer; deterministic from
  * concept_id at fixture-generation time.
  */
case class LexiconEntry(
    concept_id: String,
    surface: String,
    entity_type: String,
    embedding: Array[Float])

/** Int8-quantized lexicon row (symmetric per-vector scale) — the
  * reference's dynamic-quantization analog (`model_optimization.py:86-122`):
  * a 4× smaller broadcast for the linker at UMLS scale.
  */
case class QuantizedLexiconEntry(
    concept_id: String,
    surface: String,
    entity_type: String,
    qembedding: Array[Byte],
    scale: Float)

/** A linked mention: mention + best concept candidate and its score. */
case class LinkedMention(
    doc_id: String,
    span_idx: Int,
    entity_type: String,
    text: String,
    start: Int,
    end: Int,
    confidence: Double,
    concept_id: String,
    link_score: Double)

/** A KG triple with provenance. Output table is partitioned by `pred`. */
case class Triple(
    subj: String,
    pred: String,
    obj: String,
    doc_id: String,
    subj_type: String,
    obj_type: String)

/** Per-partition progress record for resumable runs (north_rule):
  * chunk id, row counts, wall time, input lineage hash.
  */
case class ChunkProgress(
    run_id: String,
    chunk: Int,
    docs: Long,
    mentions: Long,
    triples: Long,
    wall_ms: Long,
    input_hash: Long,
    completed_at: String)

/** Span-level metric row (per entity type; type "micro" = overall). */
case class TypeMetrics(
    entity_type: String,
    tp: Long,
    pred_count: Long,
    gold_count: Long,
    precision: Double,
    recall: Double,
    f1: Double)
