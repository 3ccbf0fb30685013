package graft.sinks

import graft.core.{Bio, Mention, Sentence}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's three prediction output formats
  * (`predict_enhanced.py:358-481`), as dataset transformations:
  *
  *  S5 JSON records  — `{text, entities:[{text,type,start,end}]}`
  *                     (`:359-395`, schema also README.md:429-449)
  *  S6 inline markup — `[Type:`/`]` markers inserted by position (`:397-431`)
  *  S7 BIO           — per-char `char\tTAG` lines (`:434-478`)
  *
  * Sentences and their mentions join on (doc_id, span_idx) — one shuffle —
  * then each format is a scalar transformation. Writers are plain
  * `ds.write.text/json`, so the sinks scale like any Spark write.
  */
object Formats {

  /** One row per sentence: (doc_id, span_idx, text, entities array),
    * entities sorted by start (stable base for all three formats).
    */
  def withEntities(sentences: Dataset[Sentence], mentions: Dataset[Mention]): DataFrame = {
    val spark = sentences.sparkSession
    import spark.implicits._
    val ents = mentions
      .groupBy($"doc_id", $"span_idx")
      .agg(sort_array(collect_list(struct($"start", $"end", $"entity_type", $"text"))).as("entities"))
    sentences.join(ents, Seq("doc_id", "span_idx"), "left")
      .withColumn("entities", coalesce($"entities", array()))
  }

  /** S5: the JSON prediction-record sink. `pretty` is irrelevant to
    * semantics (the reference offers indent=2 or compact, `:377-382`).
    */
  def jsonRecords(sentences: Dataset[Sentence], mentions: Dataset[Mention]): DataFrame = {
    val spark = sentences.sparkSession
    import spark.implicits._
    withEntities(sentences, mentions).select(
      $"doc_id", $"span_idx",
      to_json(struct(
        $"text",
        transform($"entities", e =>
          struct(
            e.getField("text").as("text"),
            e.getField("entity_type").as("type"),
            e.getField("start").as("start"),
            e.getField("end").as("end"))).as("entities"))).as("json"))
  }

  /** The reference's exact marker sort: key = (position, is_closing) with
    * opener-before-closer at equal positions (`predict_enhanced.py:403-411`
    * sorts by `(x[0], x[1].endswith("]"))` — False < True, so an opening
    * `[Type:` at position p sorts BEFORE a closing `]` at p; replicated
    * verbatim, quirk included).
    */
  def markupOne(text: String, entities: Seq[(Int, Int, String)]): String = {
    val markers = entities.flatMap { case (s, e, tpe) =>
      Seq((s, s"[$tpe:", false), (e, "]", true))
    }.sortBy { case (pos, _, closing) => (pos, closing) }
    val sb = new StringBuilder
    var last = 0
    markers.foreach { case (pos, marker, _) =>
      val p = math.min(math.max(pos, 0), text.length)
      if (p >= last) { sb.append(text.substring(last, p)); last = p }
      sb.append(marker)
    }
    sb.append(text.substring(math.min(last, text.length)))
    sb.toString
  }

  private val markupUdf = udf((text: String, ents: Seq[org.apache.spark.sql.Row]) =>
    markupOne(
      if (text == null) "" else text,
      if (ents == null) Seq.empty
      else ents.map(r => (r.getInt(0), r.getInt(1), r.getString(2)))))

  /** S6: inline-markup text sink. */
  def markupText(sentences: Dataset[Sentence], mentions: Dataset[Mention]): DataFrame = {
    val spark = sentences.sparkSession
    import spark.implicits._
    withEntities(sentences, mentions).select(
      $"doc_id", $"span_idx",
      markupUdf($"text",
        transform($"entities", e =>
          struct(e.getField("start"), e.getField("end"), e.getField("entity_type")))).as("marked"))
  }

  /** S7: BIO sink — spans re-encoded to per-char tags via the exact
    * inverse codec (`Bio.encodeBio`), emitted as `char\tTAG` lines.
    */
  def bioText(sentences: Dataset[Sentence], mentions: Dataset[Mention]): DataFrame = {
    val spark = sentences.sparkSession
    import spark.implicits._
    val bioUdf = udf((text: String, ents: Seq[org.apache.spark.sql.Row]) => {
      val t = if (text == null) "" else text
      val tags = Bio.encodeBio(
        t.length,
        if (ents == null) Seq.empty
        else ents.map(r => (r.getString(2), r.getInt(0), r.getInt(1))))
      t.zip(tags).map { case (c, tag) => s"$c\t$tag" }.mkString("\n")
    })
    withEntities(sentences, mentions).select(
      $"doc_id", $"span_idx",
      bioUdf($"text",
        transform($"entities", e =>
          struct(e.getField("start"), e.getField("end"), e.getField("entity_type")))).as("bio"))
  }
}
