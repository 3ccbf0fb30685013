package graft.data

import graft.core._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic generator for the primary input table
  * (`input_hint` shape: interleaved text + media documents) plus its gold
  * mentions/tags — the fixtures of FIXTURES.md §1/§2/§7.
  *
  * Every random choice is keyed on `Hashing.hash2(seed, ...)` of the doc
  * index, so output is identical for any partitioning, core count, or run —
  * the property the scaling benchmark (BASELINE.md §Scaling) depends on.
  *
  * Sentences are built from a fixed, prefix-free surface vocabulary per
  * entity type (shape of the reference `data/entity_dict.json`,
  * `data_augmentation.py:184-216`) embedded in filler text whose character
  * set is disjoint from the vocabulary's — so the gold spans are the ONLY
  * gazetteer matches and detector output is verifiable by construction.
  */
object DocsGen {

  /** Fixed surface vocabulary, modeled on the reference corpus' 6 entity
    * types (`evaluation.log:13-14`). Prefix-free; char inventory disjoint
    * from `Filler`.
    */
  val Vocab: Map[String, IndexedSeq[String]] = Map(
    "Anatomical" -> IndexedSeq("食管", "肝脏", "肺叶", "胃窦", "结肠", "十二指肠", "胆囊", "脾脏"),
    "Diseases" -> IndexedSeq("高血压病", "糖尿病", "肺炎", "胃癌", "肝硬化", "冠心病", "哮喘"),
    "Drug" -> IndexedSeq("阿司匹林", "青霉素", "胰岛素", "布洛芬", "泼尼松", "头孢"),
    "Image" -> IndexedSeq("胸片", "超声", "磁共振", "增强扫描"),
    "Laboratory" -> IndexedSeq("血常规", "尿常规", "血糖测定", "肌酐", "转氨酶"),
    "Operation" -> IndexedSeq("切除术", "吻合术", "引流术", "造瘘术", "修补术")
  )

  val Types: IndexedSeq[String] = Vocab.keys.toIndexedSeq.sorted

  /** Filler characters — disjoint from every vocab surface's characters. */
  private val Filler: IndexedSeq[Char] =
    "的了和与或在于为以及而且但是然后因此所由非我院行检查发现距门齿余前时再次明显未复期间住恢复可好".distinct.toIndexedSeq

  case class GoldDoc(doc: Doc, sentences: Seq[TaggedSentence], mentions: Seq[Mention])

  private def fillerRun(h: Long, minLen: Int, maxLen: Int): String = {
    val len = minLen + Hashing.pick(Hashing.mix64(h), maxLen - minLen + 1)
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      sb.append(Filler(Hashing.pick(Hashing.mix64(h + 31 * i + 7), Filler.length)))
      i += 1
    }
    sb.toString
  }

  /** One fixed hub surface for skew stress: forced into a `hubFrac` share
    * of documents (the "高血压 in millions of docs" scenario of SURVEY
    * §4.2 — the skew case the salted CC/assembly paths exist for).
    */
  val HubType = "Diseases"
  val HubSurface = "高血压病"

  /** Build one document purely from (seed, idx).
    * @param hubFrac probability that the document's first entity is forced
    *        to the fixed hub surface (0.0 = the unchanged uniform
    *        generator; any draw is keyed on (seed, idx) so the skewed
    *        corpus is as partition-independent as the uniform one)
    */
  def buildDoc(idx: Long, seed: Long, hubFrac: Double = 0.0): GoldDoc = {
    val h0 = Hashing.hash2(seed, idx)
    val docId = f"doc-$idx%010d"
    val nText = 1 + Hashing.pick(Hashing.mix64(h0 + 1), 3) // 1..3 text spans
    val nMedia = Hashing.pick(Hashing.mix64(h0 + 2), 3) // 0..2 media spans
    val nSpans = nText + nMedia
    // choose which span positions are media (deterministic subset)
    val mediaPos = (0 until nSpans)
      .sortBy(p => Hashing.mix64(h0 + 100 + p))
      .take(nMedia)
      .toSet

    val spans = Seq.newBuilder[Span]
    val sentences = Seq.newBuilder[TaggedSentence]
    val mentions = Seq.newBuilder[Mention]
    var mediaK = 0
    val hubDoc = hubFrac > 0.0 &&
      Hashing.uniformDouble(Hashing.hash2(h0, 0x4B5EADL)) < hubFrac
    var hubPlaced = false

    for (pos <- 0 until nSpans) {
      if (mediaPos.contains(pos)) {
        val kind = if (Hashing.pick(Hashing.mix64(h0 + 200 + pos), 2) == 0) "image" else "audio"
        spans += Span(kind, "", s"media://$kind/$docId/$mediaK", pos)
        mediaK += 1
      } else {
        val hs = Hashing.hash2(h0, 1000 + pos)
        val nEnts = 1 + Hashing.pick(Hashing.mix64(hs + 1), 3) // 1..3 entities
        val sb = new StringBuilder
        val ents = Seq.newBuilder[(String, String, Int, Int)] // type, text, start, end
        sb.append(fillerRun(hs + 2, 2, 8))
        var e = 0
        while (e < nEnts) {
          val forceHub = hubDoc && !hubPlaced && e == 0
          if (forceHub) hubPlaced = true
          val tpe =
            if (forceHub) HubType
            else Types(Hashing.pick(Hashing.mix64(hs + 10 + e), Types.length))
          val surf =
            if (forceHub) HubSurface
            else Vocab(tpe)(Hashing.pick(Hashing.mix64(hs + 20 + e), Vocab(tpe).length))
          val start = sb.length
          sb.append(surf)
          ents += ((tpe, surf, start, sb.length))
          sb.append(fillerRun(hs + 30 + e, 2, 10))
          e += 1
        }
        val text = sb.toString
        val entList = ents.result()
        spans += Span("text", text, "", pos)
        val tags = Bio.encodeBio(text.length, entList.map(t => (t._1, t._3, t._4)))
        sentences += TaggedSentence(docId, pos, text.map(_.toString), tags)
        entList.foreach { case (tpe, surf, s, en) =>
          mentions += Mention(docId, pos, tpe, surf, s, en, 1.0)
        }
      }
    }
    GoldDoc(Doc(docId, spans.result()), sentences.result(), mentions.result())
  }

  def gen(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      partitions: Int = 0,
      hubFrac: Double = 0.0): Dataset[GoldDoc] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.mapPartitions(_.map(i => buildDoc(i, seed, hubFrac)))
  }

  def docs(g: Dataset[GoldDoc]): Dataset[Doc] = {
    import g.sparkSession.implicits._
    g.map(_.doc)
  }

  def goldSentences(g: Dataset[GoldDoc]): Dataset[TaggedSentence] = {
    import g.sparkSession.implicits._
    g.flatMap(_.sentences)
  }

  def goldMentions(g: Dataset[GoldDoc]): Dataset[Mention] = {
    import g.sparkSession.implicits._
    g.flatMap(_.mentions)
  }

  /** All surfaces with their types — the synthetic gazetteer/lexicon seed. */
  def vocabEntries: Seq[(String, String)] =
    Vocab.toSeq.flatMap { case (tpe, surfs) => surfs.map(_ -> tpe) }.sortBy(e => (e._2, e._1))
}
