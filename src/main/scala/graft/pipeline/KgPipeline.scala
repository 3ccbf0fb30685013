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
    // back avoids any wide shuffle of the mention table.
    //
    // r6 DRIVER-LOCAL resolution path (guide §1.2 — the bench-scale cost
    // of this stage was 4-5 scheduling round-trips over a few dozen
    // rows): when the LEXICON is driver-resident (a LocalRelation — the
    // vocab/fixture shape; a parquet-backed UMLS-scale lexicon is not)
    // AND the distinct surface set passes a bounded-collect gate, the
    // scorer runs on the driver via the SAME scalar kernels the codegen
    // expressions call (Linker.surfaceResolutionLocal — equality
    // asserted in PipelineSpec), and the resolution/edge tables become
    // LocalRelations: the CC gate and both broadcast builds then cost
    // ZERO jobs. Everything beyond the gates takes the distributed path
    // unchanged. The gate action itself materializes the mentions cache
    // (one job), which the former eager count() paid anyway.
    val SurfaceGateCap = 1 << 18
    val lexLocal: Option[Seq[LexiconEntry]] =
      lexicon.queryExecution.optimizedPlan match {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          Some(lexicon.collect().toSeq) // LocalTableScan: no job
        case _ => None
      }
    val surfaces0 = mentions.select(col("text"), col("entity_type")).distinct()
    val localRes: Option[Seq[(String, String, String, Double)]] = lexLocal.flatMap { lexRows =>
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val paySchema = StructType(Seq(
        StructField("text", StringType, nullable = true),
        StructField("entity_type", StringType, nullable = true)))
      val agg = graft.ops.BoundedCollect.agg(SurfaceGateCap, paySchema)
      val row = surfaces0.agg(agg(col("text"), col("entity_type")).as("_s"))
        .select(col("_s.items").as("items"), col("_s.over").as("over")).head()
      if (row.getBoolean(1)) None // over the gate: distributed path
      else Some(Linker.surfaceResolutionLocal(
        row.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getString(1))), lexRows))
    }
    val resolution = localRes match {
      case Some(rows) =>
        rows.toDF("text", "entity_type", "concept_id", "link_score") // LocalRelation
      case None =>
        Linker.surfaceResolution(surfaces0.as[(String, String)], lexicon)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val linked = mentions
      .join(broadcast(resolution), Seq("text", "entity_type"), "inner")
      .select(col("doc_id"), col("span_idx"), col("entity_type"), col("text"),
        col("start"), col("end"), col("confidence"), col("concept_id"), col("link_score"))
      .as[LinkedMention]
    // canonicalization graph comes from the (tiny) resolution table, not
    // from the mention table: surface node ↔ resolved concept node. On
    // the driver-local path the distinct runs on the driver so the edge
    // table is a LocalRelation and the CC gate is job-free.
    val edges = localRes match {
      case Some(rows) =>
        rows.map { case (text, _, cid, _) => ("S:" + text, cid) }
          .distinct.toDF("src", "dst") // LocalRelation
      case None =>
        resolution
          .select(concat(lit("S:"), col("text")).as("src"), col("concept_id").as("dst"))
          .distinct()
    }
    val components = Canon.connectedComponents(edges)
    val triples = Triples.assemble(linked)
    val cleanup = () => {
      mentions.unpersist()
      if (localRes.isEmpty) resolution.unpersist()
      components.unpersist() // final localCheckpoint of the CC loop
      ()
    }
    (Triples.canonicalize(triples, components), cleanup)
  }
}
