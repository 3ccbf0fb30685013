package graft.graph

import graft.core.Hashing
import graft.functions.{Hash64, Mix64}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-constrained negative sampling over the materialized KG — the
  * training-data operator a KG-embedding pipeline (TransE-family) runs
  * right after triple assembly: for every positive (subj, pred, obj)
  * emit up to `k` corrupted triples whose object is a DIFFERENT concept
  * of the SAME entity type, excluding any corruption that is itself a
  * true triple (type-constrained corruption with true-negative
  * filtering).
  *
  * Determinism contract (same discipline as [[graft.ops.Sampling]]'s
  * gates): draw j for a positive is a pure function of
  * `(seed, subj|pred|obj|j)` — `hash2(seed, hashString(key))` indexes
  * into the SORTED per-type candidate array — so the sample is identical
  * under any partitioning, core count, or re-run, and the oracle's
  * sequential replica can re-derive it exactly.
  *
  * Scale shape: the candidate table is the concept vocabulary grouped by
  * type (vocabulary-bounded — it broadcasts; at 100 TB the corpus grows,
  * the ontology does not). The data-sized side takes one broadcast-hash
  * join, a bounded `k`-way explode of literals, and codegen'd hash
  * arithmetic ([[Hash64]]/[[Mix64]] — no UDF boundary per row). The
  * true-negative filter is a shuffled LEFT ANTI equi-join against the
  * distinct positive set on (subj, pred, neg_obj) — hash-partitioned,
  * spillable, never quadratic.
  */
object NegativeSampling {

  /** The draw kernel, shared verbatim with the Fixtures replica
    * (`Hashing.pick` is the same floor-mod the plan's `pmod` computes).
    */
  def drawIndex(seed: Long, subj: String, pred: String, obj: String, j: Int, n: Int): Int =
    Hashing.pick(Hashing.hash2(seed, Hashing.hashString(s"$subj|$pred|$obj|$j")), n)

  /** @param triples  positive triples with at least (subj, pred, obj, obj_type)
    * @param concepts candidate objects: (concept_id, entity_type) — the
    *                 concept vocabulary (bounded; broadcast)
    * @param k        corruption attempts per positive (survivors ≤ k)
    * @return (subj, pred, obj, neg_obj, attempt) — attempt ∈ [0, k)
    */
  def corruptObjects(
      triples: DataFrame,
      concepts: DataFrame,
      k: Int,
      seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val pos = triples.select("subj", "pred", "obj", "obj_type").distinct()
    val candByType = concepts
      .select(col("entity_type").as("obj_type"), col("concept_id"))
      .distinct()
      .groupBy("obj_type")
      .agg(sort_array(collect_set(col("concept_id"))).as("cands"))
    // hash2(seed, h) = mix64(mix64(seed) ^ h): the seed half folds to a
    // driver-side literal, the data half is codegen'd — same scalar
    // kernel as drawIndex, no UDF
    val key = concat_ws("|", col("subj"), col("pred"), col("obj"), col("attempt"))
    val h = Mix64.mix64(lit(Hashing.mix64(seed)).bitwiseXOR(Hash64.hash64(key)))
    pos
      .join(broadcast(candByType), Seq("obj_type"))
      .select(col("subj"), col("pred"), col("obj"),
        explode(array((0 until k).map(lit): _*)).as("attempt"), col("cands"))
      .withColumn("neg_obj",
        element_at(col("cands"), (pmod(h, size(col("cands"))) + 1).cast("int")))
      .drop("cands")
      // drop corruptions that are true triples for the same (subj, pred)
      // — which subsumes neg_obj == obj, since (subj, pred, obj) is
      // itself in the positive set
      .join(
        pos.select(col("subj"), col("pred"), col("obj").as("neg_obj")),
        Seq("subj", "pred", "neg_obj"), "left_anti")
      .select("subj", "pred", "obj", "neg_obj", "attempt")
  }
}
