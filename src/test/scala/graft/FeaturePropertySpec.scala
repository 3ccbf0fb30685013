package graft

import graft.core.Bio
import graft.detect.Features
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for the K2 feature model's fit/scoring invariants —
  * the algebraic facts the oracle comparisons rely on but never state
  * directly. Deterministic seeded sampling (the repo pattern: raw
  * scalacheck generators, no scalatestplus bridge in the offline cache).
  */
class FeaturePropertySpec extends AnyFunSuite {

  private val L = Bio.Labels.length

  private val charGen: Gen[Char] = Gen.oneOf("患者有高血压病史糖尿脏肺给予治疗abcxyz")
  private val sentenceGen: Gen[(Seq[String], Seq[String])] = for {
    n <- Gen.choose(1, 20)
    chars <- Gen.listOfN(n, charGen.map(_.toString))
    tags <- Gen.listOfN(n, Gen.oneOf(Bio.Labels))
  } yield (chars, tags)
  private val corpusGen: Gen[Seq[(Seq[String], Seq[String])]] =
    Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, sentenceGen))

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("fit is invariant to sentence order (exact-count determinism)") {
    samples(corpusGen, 40, 0xF17L).foreach { corpus =>
      val a = Features.fitLocal(corpus, dim = 256)
      val b = Features.fitLocal(corpus.reverse, dim = 256)
      assert(a.weights.sameElements(b.weights))
      assert(a.priors.sameElements(b.priors))
    }
  }

  test("addScores emits a log-distribution: all entries <= 0, softmax mass 1") {
    val corpora = samples(corpusGen, 20, 0x5C0L)
    val probes = samples(sentenceGen, 20, 0x9B0L)
    corpora.zip(probes).foreach { case (corpus, probe) =>
      val model = Features.fitLocal(corpus, dim = 256)
      val text = probe._1.mkString
      val scratch = new Array[Double](L)
      val out = new Array[Float](L)
      model.addScores(text, 0, text.length, out, scratch)
      assert(out.forall(_ <= 1e-6f), s"positive log-prob: ${out.mkString(",")}")
      val z = out.map(v => math.exp(v.toDouble)).sum
      assert(math.abs(z - 1.0) < 1e-4, s"softmax mass $z != 1")
    }
  }

  test("a label's weight grows with its count at a fixed bucket") {
    // more observations of (feature, label) must never DECREASE the
    // label's weight for that bucket: monotonicity of add-alpha log-MLE
    // in the count (with everything else held fixed)
    val dim = 64
    val key = 7L * L + 2L // bucket 7, label 2
    val posKey = dim.toLong * L + 2L
    samples(Gen.zip(Gen.choose(1L, 50L), Gen.choose(51L, 500L)), 40, 0x90AL)
      .foreach { case (c1, c2) =>
        val m1 = Features.fromCounts(Map(key -> c1, posKey -> c1), dim, 0.1, 1f)
        val m2 = Features.fromCounts(Map(key -> c2, posKey -> c2), dim, 0.1, 1f)
        // weight = log((c+a)/(N+a*dim)) with N == c here: increasing in c
        assert(m2.weights(7 * L + 2) > m1.weights(7 * L + 2))
      }
  }

  test("charLabels expands multi-char tokens B->I and preserves text") {
    samples(sentenceGen, 40, 0xCA7L).foreach { case (chars, tags) =>
      val (text, ids) = Features.charLabels(chars, tags)
      assert(text == chars.mkString)
      assert(ids.length == text.length)
    }
    // explicit multi-char token: B-X token expands B, I, I...
    val (text, ids) = Features.charLabels(Seq("abc", "d"), Seq("B-Drug", "O"))
    assert(text == "abcd")
    assert(ids.toSeq == Seq(
      Bio.LabelToId("B-Drug"), Bio.LabelToId("I-Drug"), Bio.LabelToId("I-Drug"), Bio.OId))
  }
}
