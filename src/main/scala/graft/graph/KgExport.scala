package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-export of the materialized KG in the int-indexed layout
  * KG-embedding trainers (TransE/DistMult-family toolkits) consume:
  * entity and relation vocabularies mapped to dense contiguous ids by
  * sorted order, and the triple set re-coded as (h, r, t) int rows.
  *
  * Scale shape: both vocabularies are bounded by the ontology, not the
  * corpus — the id assignment's row_number window runs over the
  * vocabulary-bounded distinct table only, and the data-sized triple
  * table is re-coded through three BROADCAST joins (never shuffled for
  * the export). Id assignment is by sorted node/relation name, so the
  * coding is deterministic across runs and partitionings and a SQL
  * replica can re-derive it with the same row_number.
  */
object KgExport {

  /** Dense contiguous ids by sorted name: global range-partitioned sort
    * + `zipWithIndex`, the same idiom as `Lexicon.fromSurfaces` — ids
    * equal (row_number − 1) of a global-window plan WITHOUT the
    * single-task sort that plan would force if the vocabulary ever grew
    * to ontology scale (a UMLS-sized entity set is millions of rows).
    */
  private def denseIds(names: DataFrame, nameCol: String, idCol: String): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._
    val indexed = names.select(col(nameCol)).distinct()
      .orderBy(nameCol).as[String]
      .rdd.zipWithIndex.map { case (name, i) => (name, i.toInt) }
    spark.createDataset(indexed).toDF(nameCol, idCol)
  }

  /** Dense-id entity vocabulary: (entity, ent_id) with ids 0..n-1 by
    * sorted entity name.
    */
  def entityVocab(triples: DataFrame): DataFrame =
    denseIds(
      triples.select(col("subj").as("entity"))
        .union(triples.select(col("obj").as("entity"))),
      "entity", "ent_id")

  /** Dense-id relation vocabulary: (relation, rel_id), same scheme. */
  def relationVocab(triples: DataFrame): DataFrame =
    denseIds(triples.select(col("pred").as("relation")), "relation", "rel_id")

  /** Skip-gram training pairs re-coded to dense int ids — the export
    * format a DeepWalk/node2vec trainer consumes: (c, x, n) int-id rows
    * with ids assigned by sorted node name over the union of both pair
    * sides (same deterministic scheme as [[embeddingExport]]). The
    * data-sized pair table is re-coded through two broadcast joins of
    * the vocabulary-bounded id table — never shuffled for the export.
    */
  def skipGramExport(pairs: DataFrame): DataFrame = {
    val vocab = denseIds(
      pairs.select(col("center").as("entity"))
        .union(pairs.select(col("context").as("entity"))),
      "entity", "ent_id")
    pairs
      .join(broadcast(vocab.select(col("entity").as("center"), col("ent_id").as("c"))), "center")
      .join(broadcast(vocab.select(col("entity").as("context"), col("ent_id").as("x"))), "context")
      .select("c", "x", "n")
  }

  /** The distinct triple set re-coded as (h, r, t) ints. */
  def embeddingExport(triples: DataFrame): DataFrame = {
    val ents = entityVocab(triples)
    val rels = relationVocab(triples)
    triples.select("subj", "pred", "obj").distinct()
      .join(broadcast(ents.select(col("entity").as("subj"), col("ent_id").as("h"))), "subj")
      .join(broadcast(rels.select(col("relation").as("pred"), col("rel_id").as("r"))), "pred")
      .join(broadcast(ents.select(col("entity").as("obj"), col("ent_id").as("t"))), "obj")
      .select("h", "r", "t")
  }
}
