package graft

import graft.core.{Bio, Hashing}
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property tests for the BIO codec — every branch of the reference
  * decoder (`predict_enhanced.py:282-326`, cases per FIXTURES.md §8).
  * Property cases are generated with the engine's own deterministic
  * hashing so runs are reproducible.
  */
class BioSpec extends AnyFunSuite {

  private def chars(s: String): IndexedSeq[String] = s.map(_.toString)

  private def decode(text: String, tags: String*): Seq[(String, String, Int, Int)] =
    Bio.decodeBio(chars(text), tags.toIndexedSeq).map(m => (m._1, m._2, m._3, m._4))

  test("label vocabulary matches the reference's 13 sorted labels") {
    assert(Bio.Labels == Seq(
      "B-Anatomical", "B-Diseases", "B-Drug", "B-Image", "B-Laboratory", "B-Operation",
      "I-Anatomical", "I-Diseases", "I-Drug", "I-Image", "I-Laboratory", "I-Operation", "O"))
  }

  test("simple B-I-I entity with offsets") {
    assert(decode("阿司匹林好", "B-Drug", "I-Drug", "I-Drug", "I-Drug", "O")
      == Seq(("Drug", "阿司匹林", 0, 4)))
  }

  test("B immediately after B closes the first entity") {
    assert(decode("胃癌肺炎", "B-Diseases", "I-Diseases", "B-Diseases", "I-Diseases")
      == Seq(("Diseases", "胃癌", 0, 2), ("Diseases", "肺炎", 2, 4)))
  }

  test("type-mismatched I is ignored but still counts in offsets") {
    // B-Drug, then I-Diseases (ignored), then I-Drug extends across it? No:
    // the reference appends only matching I tokens but updates end to the
    // running length — the mismatched char is NOT in tokens, and end stays
    // until a matching I arrives.
    assert(decode("阿司匹", "B-Drug", "I-Diseases", "I-Drug")
      == Seq(("Drug", "阿匹", 0, 3)))
  }

  test("leading bare I produces no entity") {
    assert(decode("阿司", "I-Drug", "I-Drug") == Seq.empty)
  }

  test("trailing entity is flushed") {
    assert(decode("在胃癌", "O", "B-Diseases", "I-Diseases")
      == Seq(("Diseases", "胃癌", 1, 3)))
  }

  test("special tokens are skipped and do not count in offsets") {
    val toks = IndexedSeq("[CLS]", "胃", "癌", "[SEP]", "[PAD]")
    val tags = IndexedSeq("O", "B-Diseases", "I-Diseases", "O", "O")
    assert(Bio.decodeBio(toks, tags).map(m => (m._1, m._2, m._3, m._4))
      == Seq(("Diseases", "胃癌", 0, 2)))
  }

  test("tokens starting with < are skipped") {
    val toks = IndexedSeq("<s>", "胃", "癌")
    val tags = IndexedSeq("O", "B-Diseases", "I-Diseases")
    assert(Bio.decodeBio(toks, tags).map(m => (m._1, m._2, m._3, m._4))
      == Seq(("Diseases", "胃癌", 0, 2)))
  }

  test("subword markers are stripped and shorten offsets") {
    val toks = IndexedSeq("ab", "##cd", "e")
    val tags = IndexedSeq("B-Drug", "I-Drug", "O")
    assert(Bio.decodeBio(toks, tags).map(m => (m._1, m._2, m._3, m._4))
      == Seq(("Drug", "abcd", 0, 4)))
  }

  test("O after entity closes it; text passes cleanEntityName") {
    assert(decode(" 胃癌 ", "O", "B-Diseases", "I-Diseases", "O")
      == Seq(("Diseases", "胃癌", 1, 3)))
  }

  test("cleanEntityName matches the reference regex semantics") {
    assert(Bio.cleanEntityName("  胃 癌  ") == "胃癌") // space collapsed then dropped
    assert(Bio.cleanEntityName("A#b%c☆d") == "A#b%cd") // ☆ outside whitelist
    assert(Bio.cleanEntityName("ab##cd") == "abcd")
    assert(Bio.cleanEntityName("高血压(重度)") == "高血压(重度)")
    assert(Bio.cleanEntityName(" x ") == "x") // python-style strip
    assert(Bio.cleanEntityName("α胃β癌γ") == "胃癌") // greek letters dropped
  }

  test("encodeBio stamps B/I with bounds checks") {
    assert(Bio.encodeBio(5, Seq(("Drug", 1, 3))) ==
      IndexedSeq("O", "B-Drug", "I-Drug", "O", "O"))
    assert(Bio.encodeBio(2, Seq(("Drug", 1, 5))) == IndexedSeq("O", "B-Drug"))
    // python negative indexing: bio_tags[-1] stamps the LAST position
    assert(Bio.encodeBio(3, Seq(("Drug", -1, 2))) == IndexedSeq("I-Drug", "I-Drug", "B-Drug"))
  }

  test("property: encode then decode round-trips non-overlapping entities") {
    for (iter <- 0 until 500) {
      val h = Hashing.hash2(7, iter)
      val n = 10 + Hashing.pick(Hashing.mix64(h), 70)
      val raw = (0 until 4).map { k =>
        val tpe = Bio.EntityTypes(Hashing.pick(Hashing.mix64(h + 10 + k), Bio.EntityTypes.length))
        val start = Hashing.pick(Hashing.mix64(h + 20 + k), 60)
        val len = 1 + Hashing.pick(Hashing.mix64(h + 30 + k), 8)
        (tpe, start, start + len)
      }
      val inside = raw.filter(e => e._3 <= n).sortBy(_._2)
      val kept = inside.foldLeft(List.empty[(String, Int, Int)]) { (acc, e) =>
        if (acc.isEmpty || e._2 >= acc.head._3) e :: acc else acc
      }.reverse
      val text = "好" * n
      val tags = Bio.encodeBio(n, kept)
      val decoded = Bio.decodeBio(chars(text), tags).map(m => (m._1, m._3, m._4))
      assert(decoded == kept, s"iter=$iter kept=$kept")
    }
  }

  test("property: decode never emits overlapping, empty, or unordered spans") {
    for (iter <- 0 until 500) {
      val h = Hashing.hash2(13, iter)
      val n = 1 + Hashing.pick(Hashing.mix64(h), 40)
      val tags = (0 until n).map(k =>
        Bio.Labels(Hashing.pick(Hashing.mix64(h + 100 + k), Bio.Labels.length)))
      val text = "好" * n
      val spans = Bio.decodeBio(chars(text), tags.toIndexedSeq).map(m => (m._3, m._4))
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 >= e1, s"iter=$iter tags=$tags")
        case _ =>
      }
      spans.foreach { case (s, e) => assert(s < e) }
    }
  }
}
