package graft.link

import graft.core.{Hashing, LexiconEntry, LinkedMention, Mention}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity linking: blocking-key candidate generation + broadcast lexicon
  * join + context-embedding dot-product scoring + argmax per mention.
  *
  * The reference's only "linking" is a dictionary membership probe
  * (`data_augmentation.py:66,77,126`); the north_star upgrades it to a
  * candidate-scored link. Plan shape (all Catalyst-native):
  *
  *   mentions --explode blocking keys--> (key, mention)
  *       ⋈ broadcast(lexicon keyed the same way)        [J1+J2]
  *       --score: exact-surface boost + dot(ctx_emb, concept_emb)
  *       --min_by argmax per mention (partial agg, no window) --> best
  *
  * The lexicon side is broadcast in the default path (small by contract —
  * `Lexicon.prune`/`quantize` exist to keep it so); when it outgrows the
  * broadcast budget anyway, [[surfaceResolutionLargeLexicon]] reverses
  * the build side: the vocabulary-bounded surface set broadcasts against
  * the DISTRIBUTED lexicon. The mention table itself never shuffles for
  * the join in either regime.
  */
object Linker {

  val EmbeddingDim: Int = graft.data.Lexicon.EmbeddingDim

  /** Deterministic context embedding for a mention: hashed char n-grams.
    * Stand-in for an encoder embedding; identical plumbing (array<float>
    * column, dot-product scoring). `dim` must match the lexicon's
    * embedding dimension when a real embedding table backs the lexicon
    * (`Lexicon.fromSurfacesWithEmbeddings`).
    */
  def contextEmbedding(text: String, dim: Int = EmbeddingDim): Array[Float] = {
    val acc = new Array[Float](dim)
    if (text.isEmpty) return acc
    var i = 0
    while (i < text.length) {
      val g2 = text.substring(i, math.min(i + 2, text.length))
      val h = Hashing.hashString(g2, 0x5EED)
      var d = 0
      while (d < dim) {
        acc(d) += (Hashing.uniformDouble(Hashing.mix64(h + d)) * 2 - 1).toFloat
        d += 1
      }
      i += 1
    }
    val norm = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
    if (norm > 0) acc.map(_ / norm) else acc
  }

  /** Blocking keys for a surface: (first char + length bucket) and a
    * 2-char-prefix key. Multiple keys raise candidate recall; `explode`
    * keeps it a narrow op.
    *
    * An EMPTY surface (decodeBio can clean a mention's text to "") gets a
    * sentinel key that matches no lexicon surface, so the mention still
    * flows through the left join and lands on the `S:` fallback concept —
    * an empty key list would make `explode` silently DROP the mention.
    */
  def blockingKeys(text: String): Seq[String] = {
    if (text.isEmpty) Seq("#empty")
    else {
      val lenBucket = math.min(text.length, 8)
      val k1 = s"${text.charAt(0)}#$lenBucket"
      val k2 = if (text.length >= 2) text.substring(0, 2) + "#p" else k1
      Seq(k1, k2).distinct
    }
  }

  // native codegen'd expressions (functions.LinkExprs) — the per-mention
  // embedding/keying kernels stay inside whole-stage codegen; no UDF
  // encoder boundary on the data-sized side of the link join
  private def blockingKeysCol(c: Column): Column =
    graft.functions.BlockingKeys.blocking_keys(c)
  private def ctxEmbCol(c: Column, dim: Int): Column =
    graft.functions.CtxEmbedding.ctx_embedding(c, dim)

  /** Link each mention to its best lexicon concept (left join semantics:
    * mentions with no candidate survive with null concept — they feed
    * canonicalization as surface-only nodes).
    */
  def link(
      mentions: Dataset[Mention],
      lexicon: Dataset[LexiconEntry],
      ctxDim: Int = EmbeddingDim): Dataset[LinkedMention] = {
    val spark = mentions.sparkSession
    import spark.implicits._

    val m = mentions
      .withColumn("ctx_emb", ctxEmbCol($"text", ctxDim))
      .withColumn("bkey", explode(blockingKeysCol($"text")))

    val lex = lexicon
      .withColumn("bkey", explode(blockingKeysCol($"surface")))
      .select($"bkey", $"concept_id", $"surface", $"entity_type".as("lex_type"), $"embedding")

    val scored = m
      .join(broadcast(lex), m("bkey") === lex("bkey") && m("entity_type") === lex("lex_type"), "left")
      .withColumn(
        "link_score",
        when($"concept_id".isNull, lit(Double.MinValue))
          .otherwise(
            when($"surface" === $"text", lit(10.0)).otherwise(lit(0.0)) +
              // native codegen'd expression — no UDF boundary in the hot path
              graft.functions.VecDot.vec_dot($"ctx_emb", $"embedding")))

    // argmax per mention via min_by over (-score, concept_id): a single
    // shuffle with map-side partial aggregation — beats a row_number window
    // (full sort, no partial agg) at every scale.
    val payload = struct(
      $"text", $"confidence",
      coalesce($"concept_id", concat(lit("S:"), $"text")).as("concept_id"),
      when($"link_score" === Double.MinValue, lit(0.0)).otherwise($"link_score").as("link_score"))
    val ordering = struct(
      (-$"link_score").as("neg_score"),
      coalesce($"concept_id", lit("\uffff")).as("tie"))

    scored
      .groupBy($"doc_id", $"span_idx", $"start", $"end", $"entity_type")
      .agg(min_by(payload, ordering).as("best"))
      .select(
        $"doc_id", $"span_idx", $"entity_type", $"best.text".as("text"),
        $"start", $"end", $"best.confidence".as("confidence"),
        $"best.concept_id".as("concept_id"), $"best.link_score".as("link_score"))
      .as[LinkedMention]
  }

  /** Surface-level resolution table: best concept per distinct
    * (text, entity_type). The link score is a pure function of the surface
    * (context embedding is text-derived), so resolving each distinct
    * surface ONCE and broadcasting the result back is semantically
    * identical to per-mention linking.
    */
  def surfaceResolution(
      surfaces: Dataset[(String, String)], // (text, entity_type)
      lexicon: Dataset[LexiconEntry],
      ctxDim: Int = EmbeddingDim): DataFrame = {
    val spark = surfaces.sparkSession
    import spark.implicits._
    // doc_id = the surface text itself so link()'s per-mention argmax key
    // (doc_id, span_idx, start, end, type) stays unique per surface
    val asMentions = surfaces.map { case (text, tpe) =>
      Mention(text, 0, tpe, text, 0, 0, 1.0)
    }
    link(asMentions, lexicon, ctxDim).toDF()
      .select($"text", $"entity_type", $"concept_id", $"link_score")
  }

  /** Resolution for lexicons TOO LARGE to broadcast (a full UMLS-scale
    * concept table with embeddings can exceed any executor's broadcast
    * budget even int8-quantized): reverse the build side. The distinct
    * surface set is vocabulary-bounded and tiny, so it broadcasts against
    * the DISTRIBUTED lexicon for the candidate inner join; the argmax
    * shuffles only (surface, candidate) pairs — bounded by candidates per
    * surface, never by lexicon size — and surfaces with no candidate pick
    * up the `S:` fallback through a final small left join. Output is
    * identical to [[surfaceResolution]] (equality-tested).
    */
  def surfaceResolutionLargeLexicon(
      surfaces: Dataset[(String, String)], // (text, entity_type)
      lexicon: Dataset[LexiconEntry],
      ctxDim: Int = EmbeddingDim): DataFrame = {
    val spark = surfaces.sparkSession
    import spark.implicits._
    val m = surfaces.toDF("text", "entity_type")
      .withColumn("ctx_emb", ctxEmbCol($"text", ctxDim))
      .withColumn("mkey", explode(blockingKeysCol($"text")))
    val lex = lexicon
      .withColumn("bkey", explode(blockingKeysCol($"surface")))
      .select($"bkey", $"concept_id", $"surface", $"entity_type".as("lex_type"), $"embedding")
    val candidates = lex
      .join(broadcast(m), lex("bkey") === m("mkey") && lex("lex_type") === m("entity_type"))
      .withColumn(
        "link_score",
        when($"surface" === $"text", lit(10.0)).otherwise(lit(0.0)) +
          graft.functions.VecDot.vec_dot($"ctx_emb", $"embedding"))
    val best = candidates
      .groupBy($"text", $"entity_type")
      .agg(min_by(
        struct($"concept_id", $"link_score"),
        struct((-$"link_score").as("neg_score"), $"concept_id".as("tie"))).as("best"))
      .select($"text", $"entity_type",
        $"best.concept_id".as("concept_id"), $"best.link_score".as("link_score"))
    surfaces.toDF("text", "entity_type")
      .join(best, Seq("text", "entity_type"), "left")
      .select($"text", $"entity_type",
        coalesce($"concept_id", concat(lit("S:"), $"text")).as("concept_id"),
        coalesce($"link_score", lit(0.0)).as("link_score"))
  }

  /** Driver-local replica of [[surfaceResolution]] (r6): score a BOUNDED
    * surface set against a BOUNDED lexicon entirely on the driver — zero
    * Spark jobs. Used by the pipeline when both sides pass its gates
    * (the surface set is vocabulary-bounded by design — the pipeline
    * already BROADCASTS the resolution, so driver-side scoring assumes
    * nothing new); the distributed path remains for everything else.
    *
    * Output-identical to the DataFrame path by construction: it calls
    * the SAME scalar kernels the codegen expressions call
    * ([[contextEmbedding]], [[blockingKeys]]; the dot replicates
    * `functions.VecDot` — float×float products accumulated
    * left-to-right in double), and the argmax replicates `min_by` over
    * struct((-score), concept_id): doubles via java.lang.Double.compare
    * (Spark's double ordering), tie on the concept id's UTF-8 binary
    * order (concept ids are ASCII, so String order coincides).
    * Equality with the DataFrame path is asserted in PipelineSpec.
    */
  def surfaceResolutionLocal(
      surfaces: Seq[(String, String)],
      lexicon: Seq[LexiconEntry],
      ctxDim: Int = EmbeddingDim): Seq[(String, String, String, Double)] = {
    // candidate index: (blocking key, entity_type) → entries
    val byKey = scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.ArrayBuffer[LexiconEntry]]
    lexicon.foreach { e =>
      blockingKeys(e.surface).foreach { k =>
        byKey.getOrElseUpdate((k, e.entity_type), scala.collection.mutable.ArrayBuffer.empty) += e
      }
    }
    def dot(x: Array[Float], y: Array[Float]): Double = {
      val n = math.min(x.length, y.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
      acc
    }
    surfaces.map { case (text, tpe) =>
      val ctx = contextEmbedding(text, ctxDim)
      // distinct candidates across the surface's keys (a duplicate from a
      // second shared key scores identically — argmax unaffected)
      val cands = blockingKeys(text).iterator
        .flatMap(k => byKey.getOrElse((k, tpe), Nil))
        .toSeq.distinct
      if (cands.isEmpty) (text, tpe, "S:" + text, 0.0)
      else {
        var best: LexiconEntry = null
        var bestScore = 0.0
        cands.foreach { e =>
          val score = (if (e.surface == text) 10.0 else 0.0) + dot(ctx, e.embedding)
          val better =
            if (best == null) true
            else {
              // min_by over struct((-score) asc, concept_id asc)
              val c = java.lang.Double.compare(-score, -bestScore)
              c < 0 || (c == 0 && e.concept_id < best.concept_id)
            }
          if (better) { best = e; bestScore = score }
        }
        (text, tpe, best.concept_id, bestScore)
      }
    }
  }

  /** Scale path used by the pipeline: dedup surfaces (map-side combine
    * makes the shuffle tiny — the distinct surface set is vocabulary-
    * bounded, not data-bounded), run the full scorer on the small set,
    * then broadcast-join the resolution back onto mentions. ZERO wide
    * shuffles of the mention table; output identical to `link`.
    */
  def linkBySurface(
      mentions: Dataset[Mention],
      lexicon: Dataset[LexiconEntry],
      ctxDim: Int = EmbeddingDim): Dataset[LinkedMention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val surfaces = mentions.select($"text", $"entity_type").distinct().as[(String, String)]
    val resolution = surfaceResolution(surfaces, lexicon, ctxDim)
    mentions
      .join(broadcast(resolution), Seq("text", "entity_type"), "inner")
      .select(
        $"doc_id", $"span_idx", $"entity_type", $"text", $"start", $"end",
        $"confidence", $"concept_id", $"link_score")
      .as[LinkedMention]
  }
}
