package graft

import graft.aug.Augment
import graft.core.{Mention, Sentence, TaggedSentence}
import graft.metrics.LabelStats
import graft.sinks.Formats
import org.scalatest.funsuite.AnyFunSuite

class AugmentFormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def chars(s: String): IndexedSeq[String] = s.map(_.toString)

  // ---------------------------------------------------------------- Augment

  test("entityReplace longer replacement reproduces the reference's duplicate-tail behavior") {
    // python trace (data_augmentation.py:126-148), dict choice fixed:
    //   words [X,Y] labels [B-Drug, I-Drug] → replace with ABC
    //   slice-assign: words=[A,B,C], labels=[B,I]  (labels truncated [:old_len])
    //   insert loop at end=2: words=[A,B,C,C], labels=[B,I,I]
    val rng = new Augment.Rng(1) // single entity, single form → choices are forced
    val (w, l) = Augment.entityReplace(
      chars("XY"), IndexedSeq("B-Drug", "I-Drug"),
      Map("Drug" -> IndexedSeq("ABC")), rng, replaceRatio = 1.0)
    assert(w == IndexedSeq("A", "B", "C", "C"))
    assert(l == IndexedSeq("B-Drug", "I-Drug", "I-Drug"))
  }

  test("entityReplace shorter replacement truncates the slot") {
    val rng = new Augment.Rng(1)
    val (w, l) = Augment.entityReplace(
      chars("XYZ"), IndexedSeq("B-Drug", "I-Drug", "I-Drug"),
      Map("Drug" -> IndexedSeq("AB")), rng, replaceRatio = 1.0)
    assert(w == IndexedSeq("A", "B"))
    assert(l == IndexedSeq("B-Drug", "I-Drug"))
  }

  test("synonymReplace replaces only O-runs and keeps entity labels intact") {
    val words = chars("病人去医院看病了")
    val labels = IndexedSeq("B-Diseases", "I-Diseases", "O", "O", "O", "O", "O", "O")
    val syn = Map("医院" -> IndexedSeq("诊所"))
    val rng = new Augment.Rng(7)
    val (w, l) = Augment.synonymReplace(words, labels, syn, rng, replaceRatio = 1.0)
    assert(w.mkString.startsWith("病人"))
    assert(w.mkString.contains("诊所"))
    assert(!w.mkString.contains("医院"))
    assert(l.take(2) == Seq("B-Diseases", "I-Diseases"))
    assert(l.drop(2).forall(_ == "O"))
  }

  test("augmentCorpus is deterministic and partition-independent") {
    import spark.implicits._
    val base = (0 until 200).map { i =>
      TaggedSentence(f"d$i%04d", 0, chars("病人去医院看病了"),
        IndexedSeq("B-Diseases", "I-Diseases", "O", "O", "O", "O", "O", "O"))
    }
    val syn = Map("医院" -> IndexedSeq("诊所", "医疗中心"))
    val ent = Map("Diseases" -> IndexedSeq("高血压", "糖尿病"))
    val a = Augment.augmentCorpus(base.toDS().repartition(1), syn, ent).collect()
      .map(ts => (ts.doc_id, ts.chars.mkString, ts.tags.mkString(","))).sorted.toSeq
    val b = Augment.augmentCorpus(base.toDS().repartition(13), syn, ent).collect()
      .map(ts => (ts.doc_id, ts.chars.mkString, ts.tags.mkString(","))).sorted.toSeq
    assert(a == b)
    val nAug = a.count(_._1.endsWith("-aug"))
    assert(nAug > 100 && nAug < 200) // ~70% gate
  }

  // ---------------------------------------------------------------- Formats

  private def sentMen = {
    import spark.implicits._
    val sents = Seq(Sentence("d1", 0, "前胃癌后服阿司匹林了")).toDS()
    val men = Seq(
      Mention("d1", 0, "Diseases", "胃癌", 1, 3, 1.0),
      Mention("d1", 0, "Drug", "阿司匹林", 5, 9, 1.0)).toDS()
    (sents, men)
  }

  test("markup inserts [Type: and ] at the reference's positions") {
    val (s, m) = sentMen
    val row = Formats.markupText(s, m).collect().head
    assert(row.getAs[String]("marked") == "前[Diseases:胃癌]后服[Drug:阿司匹林]了")
  }

  test("markup opener-before-closer quirk at equal positions") {
    // adjacent entities: close of A and open of B both at pos 2; the
    // reference sorts openers first (predict_enhanced.py:403-411)
    assert(Formats.markupOne("胃癌头孢", Seq((0, 2, "Diseases"), (2, 4, "Drug"))) ==
      "[Diseases:胃癌[Drug:]头孢]")
  }

  test("json records carry the reference schema") {
    val (s, m) = sentMen
    val json = Formats.jsonRecords(s, m).collect().head.getAs[String]("json")
    assert(json.contains("\"entities\""))
    assert(json.contains("\"type\":\"Diseases\""))
    assert(json.contains("\"start\":1") && json.contains("\"end\":3"))
  }

  test("bio sink re-encodes spans to char\\tTAG lines") {
    val (s, m) = sentMen
    val bio = Formats.bioText(s, m).collect().head.getAs[String]("bio")
    val lines = bio.split("\n")
    assert(lines(0) == "前\tO")
    assert(lines(1) == "胃\tB-Diseases")
    assert(lines(2) == "癌\tI-Diseases")
    assert(lines(5) == "阿\tB-Drug")
    assert(lines(8) == "林\tI-Drug")
    assert(lines(9) == "了\tO")
  }

  // ---------------------------------------------------------------- LabelStats

  test("label distribution excludes O and computes shares") {
    import spark.implicits._
    val corpus = Seq(
      TaggedSentence("a", 0, chars("xyz"), IndexedSeq("B-Drug", "I-Drug", "O")),
      TaggedSentence("b", 0, chars("xy"), IndexedSeq("B-Drug", "O"))).toDS()
    val rows = LabelStats.labelDistribution(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("B-Drug", 2L, 0.666667), ("I-Drug", 1L, 0.333333)))
  }

  test("length histogram buckets") {
    import spark.implicits._
    val corpus = Seq(
      TaggedSentence("a", 0, chars("x" * 5), IndexedSeq.fill(5)("O")),
      TaggedSentence("b", 0, chars("x" * 15), IndexedSeq.fill(15)("O")),
      TaggedSentence("c", 0, chars("x" * 17), IndexedSeq.fill(17)("O"))).toDS()
    val rows = LabelStats.lengthHistogram(corpus).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((0L, 1L), (10L, 2L)))
  }
}
