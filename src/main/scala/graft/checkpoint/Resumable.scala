package graft.checkpoint

import graft.core.{ChunkProgress, Doc, LexiconEntry}
import graft.pipeline.KgPipeline
import graft.tables.Icebergish
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable, checkpointed pipeline runs (north_rule: "resumable from
  * checkpoint with per-partition lineage + metrics").
  *
  * The unit of progress is a CHUNK: `pmod(xxhash64(doc_id), nChunks)` —
  * deterministic, partition-independent, and stable across restarts (the
  * Spark analog of the reference's per-epoch checkpointing loop,
  * `train_enhanced.py:426-449`). For each incomplete chunk the driver:
  *
  *   1. filters the docs table to the chunk (predicate pushes to the scan),
  *   2. runs the full KG pipeline on it,
  *   3. appends the triples as ONE Icebergish snapshot (atomic commit),
  *   4. appends a ChunkProgress row (docs/mentions/triples counts, wall
  *      time, input lineage hash) to the progress table.
  *
  * A restart reads the progress table and skips completed chunks; a crash
  * between (3) and (4) re-runs one chunk, whose snapshot is superseded —
  * consumers read `triples` via the manifest chain, and `dedupe` on
  * (chunk) can be layered if exactly-once matters downstream.
  */
object Resumable {

  def chunkOf(nChunks: Int) = pmod(xxhash64(col("doc_id")), lit(nChunks)).cast("int")

  def completedChunks(spark: SparkSession, progressRoot: String): Set[Int] = {
    if (!Icebergish.exists(spark, progressRoot)) Set.empty
    else {
      import spark.implicits._
      Icebergish.read(spark, progressRoot).select($"chunk").as[Int].collect().toSet
    }
  }

  /** Run (or resume) a full pipeline over the docs table.
    * @return per-chunk progress rows of THIS invocation
    */
  def run(
      docs: Dataset[Doc],
      lexicon: Dataset[LexiconEntry],
      triplesRoot: String,
      progressRoot: String,
      nChunks: Int,
      runId: String,
      failAfterChunks: Int = Int.MaxValue): Seq[ChunkProgress] = {
    val spark = docs.sparkSession
    import spark.implicits._

    val done = completedChunks(spark, progressRoot)
    val out = Seq.newBuilder[ChunkProgress]
    var executed = 0

    (0 until nChunks).filterNot(done).foreach { chunk =>
      if (executed >= failAfterChunks) throw new RuntimeException(s"injected failure before chunk $chunk")
      val t0 = System.nanoTime()
      val chunkDocs = docs.filter(chunkOf(nChunks) === chunk)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = chunkDocs.count()
      // input lineage hash: checksum of doc ids + span signature, proving
      // WHAT data this chunk covered (decimal sum — ANSI-safe)
      val inputHash = KgPipeline.spanSignature(chunkDocs.toDF())
        .agg(sum(xxhash64(col("doc_id"), col("span_sig")).cast("decimal(38,0)")))
        .head().getDecimal(0)
      val triples = KgPipeline.run(chunkDocs, lexicon)
        .withColumn("chunk", lit(chunk))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTriples = triples.count()
      Icebergish.commit(triples.toDF(), triplesRoot, "append")
      val wallMs = (System.nanoTime() - t0) / 1000000
      val progress = ChunkProgress(
        runId, chunk, nDocs, -1L, nTriples, wallMs,
        if (inputHash == null) 0L else inputHash.longValue(),
        java.time.Instant.now().toString)
      Icebergish.commit(Seq(progress).toDS().toDF(), progressRoot, "append")
      chunkDocs.unpersist()
      triples.unpersist()
      out += progress
      executed += 1
    }
    out.result()
  }
}
