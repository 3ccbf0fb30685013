package graft.pipeline

import graft.assemble.Triples
import graft.canon.Canon
import graft.core._
import graft.data.Lexicon
import graft.detect.Detector
import graft.link.Linker
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline (north_star):
  *
  *   docs (interleaved text+media)
  *     → explode text spans (media spans pass through untouched — the
  *       span-sequence invariant is checked by `spanSignature`)
  *     → repartition by hash(doc_id)                  [north_rule]
  *     → batched mapPartitions mention detector       [Detector]
  *     → broadcast-lexicon link                       [Linker]
  *     → connected-components canonicalization        [Canon]
  *     → relation assembly → triples                  [Triples]
  *
  * All stages are Dataset/DataFrame transformations; the only
  * Catalyst-opaque region is the detector kernel, kept late so scan
  * pruning/pushdown happen first.
  */
object KgPipeline {

  /** Text spans → sentences. `posexplode` keeps the span's array position
    * so span order is never lost; media spans are filtered here but the
    * docs table itself is untouched (the invariant is over the input rows).
    */
  def sentences(docs: Dataset[Doc]): Dataset[Sentence] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id", posexplode($"spans").as(Seq("span_idx", "span")))
      .filter($"span.kind" === "text" && length($"span.text") > 0)
      .select($"doc_id", $"span_idx", $"span.text".as("text"))
      .as[Sentence]
  }

  /** The per-row span-sequence signature: (kind, text, media_ref, order)
    * per doc — equality of this column before/after any stage proves the
    * invariant the north_star requires.
    */
  def spanSignature(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      sha2(
        to_json(
          transform(col("spans"), s =>
            struct(s.getField("kind"), s.getField("text"), s.getField("media_ref"), s.getField("offset")))),
        256).as("span_sig"))

  def detectMentions(
      docs: Dataset[Doc],
      gazetteer: Iterable[(String, String)],
      numPartitions: Int = 0,
      feats: Option[graft.detect.Features.FeatureModel] = None): Dataset[Mention] = {
    val spark = docs.sparkSession
    val sents0 = sentences(docs)
    // explicit repartition by doc_id hash (north_rule) — co-locates a doc's
    // sentences and evens the load before the CPU-bound detector.
    // The partition COUNT must be explicit (r6, guide §2.2/§2.5): a bare
    // repartition(col) lets AQE coalesce by SHUFFLE BYTES, and sentence
    // rows are tiny — at bench scale the whole detect stage was coalesced
    // to ONE task, serializing the kernel on one core. Width is derived
    // from the session (max of cluster cores and the configured shuffle
    // width), never a constant: locally that is the core count; on a real
    // cluster whatever parallelism the session is provisioned for.
    val width =
      if (numPartitions > 0) numPartitions
      else math.max(
        spark.sparkContext.defaultParallelism,
        spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val sents = sents0.repartition(width, col("doc_id"))
    val gazBc = Detector.broadcastGazetteer(spark, gazetteer)
    val featsBc = feats.map(spark.sparkContext.broadcast(_)).orNull
    Detector.detect(sents, gazBc, featsBc = featsBc)
  }

  /** Full pipeline: docs + lexicon → canonicalized triples. Internal
    * persists (mentions, resolution, components) stay alive for the
    * returned lazy Dataset; long-lived sessions that run many pipelines
    * should use [[runWithCleanup]] or `spark.catalog.clearCache()`.
    */
  def run(
      docs: Dataset[Doc],
      lexicon: Dataset[LexiconEntry],
      numPartitions: Int = 0,
      feats: Option[graft.detect.Features.FeatureModel] = None): Dataset[Triple] =
    runWithCleanup(docs, lexicon, numPartitions, feats)._1

  /** [[run]] plus a cleanup thunk that unpersists the pipeline's internal
    * caches — call it once the returned triples have been materialized
    * (counted/written).
    */
  def runWithCleanup(
      docs: Dataset[Doc],
      lexicon: Dataset[LexiconEntry],
      numPartitions: Int = 0,
      feats: Option[graft.detect.Features.FeatureModel] = None): (Dataset[Triple], () => Unit) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gaz = Lexicon.gazetteerEntries(lexicon)
    // the detector is the CPU-dominant stage: persist its output so the
    // surfaces-distinct job (materialized below) and the main linked-join
    // job run it ONCE, not twice (r1 VERDICT "What's wrong" #3). Serialized
    // MEMORY_AND_DISK: mentions spill to disk rather than re-detecting.
    // Callers release it via unpersist/clearCache when the returned triples
    // have been consumed (Verify/Bench clear the cache per query).
    val mentions = detectMentions(docs, gaz, numPartitions, feats)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // surface-level link resolution: the distinct (text, type) set is
    // vocabulary-bounded, so linking it once and broadcasting the result
    // back avoids any wide shuffle of the mention table
    val surfaces = mentions.select(col("text"), col("entity_type")).distinct()
      .as[(String, String)]
    // tiny (vocabulary-bounded) → persist so the edges branch and the
    // broadcast branch don't each re-run the distinct. No eager count
    // (r6): the FIRST action over the returned plan — the CC gate's
    // bounded-collect aggregate, whose edges derive from resolution —
    // materializes this cache (and the mentions cache) exactly once; a
    // dedicated count() job only added a full scheduling round-trip.
    val resolution = Linker.surfaceResolution(surfaces, lexicon)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val linked = mentions
      .join(broadcast(resolution), Seq("text", "entity_type"), "inner")
      .select(col("doc_id"), col("span_idx"), col("entity_type"), col("text"),
        col("start"), col("end"), col("confidence"), col("concept_id"), col("link_score"))
      .as[LinkedMention]
    // canonicalization graph comes from the (tiny) resolution table, not
    // from the mention table: surface node ↔ resolved concept node
    val edges = resolution
      .select(concat(lit("S:"), col("text")).as("src"), col("concept_id").as("dst"))
      .distinct()
    val components = Canon.connectedComponents(edges)
    val triples = Triples.assemble(linked)
    val cleanup = () => {
      mentions.unpersist()
      resolution.unpersist()
      components.unpersist() // final localCheckpoint of the CC loop
      ()
    }
    (Triples.canonicalize(triples, components), cleanup)
  }
}
