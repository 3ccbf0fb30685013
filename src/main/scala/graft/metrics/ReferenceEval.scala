package graft.metrics

import graft.core.{Bio, Mention, TaggedSentence}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Reference-parity evaluation: reproduce the reference's seqeval-based
  * span metrics (`evaluate.py:310-337`) from its own artifacts — gold BIO
  * corpus vs a prediction dump in the same format
  * (`results/test_predictions.txt`, written by `evaluate.py:399-419`).
  *
  * Both corpora are read distributed; sentences pair by corpus ORDER
  * (the reference zips them positionally, `evaluate.py:295-302`), and each
  * pair is truncated to the shorter side because the model dump is capped
  * at max_len=128 (`config.py:14`). Entity extraction uses the
  * seqeval/conlleval scheme (`Bio.seqevalEntities`).
  */
object ReferenceEval {

  /** Align gold/pred sentence lists positionally and emit both mention
    * sets. Sentence index becomes the doc_id so the exact-span-match join
    * key is (idx, start, end, type).
    */
  def mentionPair(
      gold: Dataset[TaggedSentence],
      pred: Dataset[TaggedSentence]): (Dataset[Mention], Dataset[Mention]) = {
    val spark = gold.sparkSession
    import spark.implicits._
    val paired = gold
      .joinWith(pred, gold("doc_id") === pred("doc_id"), "inner")

    def side(extractPred: Boolean): Dataset[Mention] =
      paired.flatMap { case (g, p) =>
        val n = math.min(g.tags.length, p.tags.length)
        val tags = (if (extractPred) p.tags else g.tags).slice(0, n).toIndexedSeq
        Bio.seqevalEntities(tags).map { case (tpe, s, e) =>
          Mention(g.doc_id, 0, tpe, "", s, e, 1.0)
        }
      }

    (side(extractPred = false), side(extractPred = true))
  }

  /** Positionally-paired (gold_tag, pred_tag) per kept token — the input
    * of the confusion matrix (`evaluate.py:472-493`).
    */
  def tokenPairs(
      gold: Dataset[TaggedSentence],
      pred: Dataset[TaggedSentence]): org.apache.spark.sql.DataFrame = {
    val spark = gold.sparkSession
    import spark.implicits._
    gold
      .joinWith(pred, gold("doc_id") === pred("doc_id"), "inner")
      .flatMap { case (g, p) =>
        val n = math.min(g.tags.length, p.tags.length)
        (0 until n).map(i => (g.tags(i), p.tags(i)))
      }
      .toDF("gold_tag", "pred_tag")
  }

  /** The reference's per-token prediction dump (S9, `evaluate.py:399-419`):
    * `{id, words, true_labels, pred_labels}` JSON rows.
    */
  def predictionDump(
      gold: Dataset[TaggedSentence],
      pred: Dataset[TaggedSentence]): org.apache.spark.sql.DataFrame = {
    val spark = gold.sparkSession
    import spark.implicits._
    gold
      .joinWith(pred, gold("doc_id") === pred("doc_id"), "inner")
      .map { case (g, p) =>
        val n = math.min(g.tags.length, p.tags.length)
        (g.doc_id, g.chars.take(n), g.tags.take(n), p.tags.take(n))
      }
      .toDF("id", "words", "true_labels", "pred_labels")
  }

  /** Full comparison → per-type metrics + micro row, reproducing the
    * numbers seqeval would print for the same two files.
    */
  def evaluate(
      gold: Dataset[TaggedSentence],
      pred: Dataset[TaggedSentence]): (Dataset[graft.core.TypeMetrics], graft.core.TypeMetrics) = {
    val (g, p) = mentionPair(gold, pred)
    val per = SpanMetrics.perType(p, g)
    (per, SpanMetrics.micro(per))
  }
}
