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
      .joinWith(pred,
        gold("doc_id") === pred("doc_id") && gold("span_idx") === pred("span_idx"), "inner")

    def side(extractPred: Boolean): Dataset[Mention] =
      paired.flatMap { case (g, p) =>
        val n = math.min(g.tags.length, p.tags.length)
        val tags = (if (extractPred) p.tags else g.tags).slice(0, n).toIndexedSeq
        Bio.seqevalEntities(tags).map { case (tpe, s, e) =>
          Mention(g.doc_id, g.span_idx, tpe, "", s, e, 1.0)
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
      .joinWith(pred,
        gold("doc_id") === pred("doc_id") && gold("span_idx") === pred("span_idx"), "inner")
      .flatMap { case (g, p) =>
        val n = math.min(g.tags.length, p.tags.length)
        (0 until n).map(i => (g.tags(i), p.tags(i)))
      }
      .toDF("gold_tag", "pred_tag")
  }

  /** Re-encode detected mentions to per-char BIO tags per sentence (the
    * inverse codec) — builds the PREDICTED TaggedSentence corpus that the
    * confusion-matrix and prediction-dump operators compare against gold.
    */
  def tagsFromMentions(
      sents: Dataset[graft.core.Sentence],
      mentions: Dataset[Mention]): Dataset[TaggedSentence] = {
    val spark = sents.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ents = mentions
      .groupBy($"doc_id", $"span_idx")
      .agg(collect_list(struct($"entity_type", $"start", $"end")).as("ents"))
    sents.join(ents, Seq("doc_id", "span_idx"), "left")
      .select($"doc_id", $"span_idx", $"text",
        coalesce($"ents", array()).as("ents"))
      .as[(String, Int, String, Seq[(String, Int, Int)])]
      .map { case (d, si, text, es) =>
        TaggedSentence(d, si, text.map(_.toString), Bio.encodeBio(text.length, es))
      }
  }

  /** The reference's per-token prediction dump (S9, `evaluate.py:399-419`):
    * `{id, words, true_labels, pred_labels}` JSON rows (plus span_idx —
    * our docs carry several sentences each).
    */
  def predictionDump(
      gold: Dataset[TaggedSentence],
      pred: Dataset[TaggedSentence]): org.apache.spark.sql.DataFrame = {
    val spark = gold.sparkSession
    import spark.implicits._
    gold
      .joinWith(pred,
        gold("doc_id") === pred("doc_id") && gold("span_idx") === pred("span_idx"), "inner")
      .map { case (g, p) =>
        val n = math.min(g.tags.length, p.tags.length)
        (g.doc_id, g.span_idx, g.chars.take(n), g.tags.take(n), p.tags.take(n))
      }
      .toDF("id", "span_idx", "words", "true_labels", "pred_labels")
  }

  /** The reference's VERBOSE per-token dump
    * (`results/test_predictions_verbose.txt`): fixed-width columns
    * 位置(6) 字符(8) 真实标签(15) 预测标签(15) + ✓/✗, positions resetting
    * per sentence, one continuous table. Layout replicated from the
    * artifact byte-for-byte (no generating script ships in the reference);
    * `ReferenceParitySpec` proves equality against the artifact itself.
    */
  def predictionDumpVerbose(
      gold: Dataset[TaggedSentence],
      pred: Dataset[TaggedSentence]): org.apache.spark.sql.DataFrame = {
    val spark = gold.sparkSession
    import spark.implicits._
    gold
      .joinWith(pred,
        gold("doc_id") === pred("doc_id") && gold("span_idx") === pred("span_idx"), "inner")
      .map { case (g, p) =>
        val n = math.min(g.tags.length, p.tags.length)
        val lines = (0 until n).map { i =>
          val mark = if (g.tags(i) == p.tags(i)) "✓" else "✗"
          // 字符 column shows the PRED side's (tokenizer's) chars — the
          // artifact prints [UNK] where the model's tokenizer did
          pad(i.toString, 6) + pad(p.chars(i), 8) + pad(g.tags(i), 15) + pad(p.tags(i), 15) + mark
        }
        (g.doc_id, g.span_idx, lines.mkString("\n"))
      }
      .toDF("id", "span_idx", "verbose")
  }

  private def pad(s: String, w: Int): String =
    if (s.length >= w) s else s + (" " * (w - s.length))

  /** The verbose table's fixed header (two lines, artifact layout). */
  val VerboseHeader: String =
    pad("位置", 6) + pad("字符", 8) + pad("真实标签", 15) + pad("预测标签", 15) + "是否正确\n" + ("-" * 60)

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
