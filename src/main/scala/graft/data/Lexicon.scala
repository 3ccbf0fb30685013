package graft.data

import graft.core.{Hashing, LexiconEntry, Mention, TaggedSentence}
import graft.detect.Detector
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UMLS-style linking lexicon (FIXTURES.md §3).
  *
  * Seeded the way the reference seeds its entity dictionary
  * (`data_augmentation.py:184-216` writes `{entity_type: [surfaces]}`),
  * but harvested at scale from gold corpora: decode gold BIO tags to
  * entities (the reference's own gold-extraction scan,
  * `data_augmentation.py:105-119`), take the distinct (surface, type)
  * pairs, and assign deterministic concept ids + embeddings.
  *
  * The id assignment uses a row_number over a total order (entity_type,
  * surface) so ids are stable regardless of partitioning. Embeddings are
  * deterministic hashes of (concept_id, surface) — stand-ins for real
  * concept embeddings with identical Spark-side plumbing.
  */
object Lexicon {

  val EmbeddingDim = 32

  /** Decode gold tags → distinct surfaces per type → lexicon entries. */
  def harvest(tagged: Dataset[TaggedSentence]): Dataset[LexiconEntry] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    val surfaces = tagged
      .flatMap { ts =>
        graft.core.Bio
          .decodeBio(ts.chars.toIndexedSeq, ts.tags.toIndexedSeq)
          .map { case (tpe, text, _, _, _) => (text, tpe) }
      }
      .toDF("surface", "entity_type")
      .filter(length($"surface") > 0)
      .distinct()
    fromSurfaces(surfaces.as[(String, String)])
  }

  /** Build lexicon rows from distinct (surface, entity_type) pairs. */
  def fromSurfaces(surfaces: Dataset[(String, String)]): Dataset[LexiconEntry] = {
    val spark = surfaces.sparkSession
    import spark.implicits._
    val w = Window.orderBy($"_2", $"_1") // total order → stable ids.
    // Window without partition = single-task sort; fine for a lexicon
    // (small side by contract — it must broadcast). At true UMLS scale
    // (~15M rows) swap for zipWithIndex over a sorted Dataset.
    surfaces
      .toDF("surface", "entity_type")
      .withColumn("rn", row_number().over(Window.orderBy($"entity_type", $"surface")))
      .as[(String, String, Int)]
      .map { case (surface, tpe, rn) =>
        val cid = f"C${rn}%07d"
        LexiconEntry(cid, surface, tpe, Hashing.embedding(cid + "|" + surface, EmbeddingDim))
      }
  }

  /** Gazetteer view for the detector: surface → type. Collected to the
    * driver for broadcast (the lexicon is the designated broadcast side).
    */
  def gazetteerEntries(lex: Dataset[LexiconEntry]): Array[(String, String)] = {
    val spark = lex.sparkSession
    import spark.implicits._
    lex.map(e => (e.surface, e.entity_type)).collect()
  }
}
