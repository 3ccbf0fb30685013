package graft

import graft.core.Bio
import graft.data.BioCorpus
import graft.metrics.ReferenceEval
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests against the reference's own artifacts at /root/reference
  * (read-only). Fixture numbers were computed independently with a Python
  * implementation of seqeval's default scheme; the gold-side per-type
  * supports exactly match the reference's published
  * `evaluation_results.json` (944/441/173/93/150/88), which pins the
  * extraction semantics.
  */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  private val refData = "/root/reference/data"
  private val refAvailable = new java.io.File(refData).isDirectory

  test("BIO reader reproduces the reference corpus sentence counts") {
    assume(refAvailable)
    assert(BioCorpus.read(spark, s"$refData/train.txt").count() == 6837)
    assert(BioCorpus.read(spark, s"$refData/dev.txt").count() == 853)
    assert(BioCorpus.read(spark, s"$refData/test.txt").count() == 866)
  }

  test("label vocabulary induction over the real corpora yields the 13 reference labels") {
    assume(refAvailable)
    val vocab = BioCorpus.labelList(
      BioCorpus.read(spark, s"$refData/train.txt"),
      BioCorpus.read(spark, s"$refData/dev.txt"),
      BioCorpus.read(spark, s"$refData/test.txt"))
    assert(vocab == Bio.Labels)
  }

  test("span metrics reproduce seqeval numbers on the reference prediction dump") {
    assume(refAvailable)
    val gold = BioCorpus.readIndexed(spark, s"$refData/test.txt")
    val pred = BioCorpus.readIndexed(spark, "/root/reference/results/test_predictions.txt")
    val (perType, micro) = ReferenceEval.evaluate(gold, pred)

    // golden fixture: independently computed (python) seqeval-default
    // counts over (test.txt gold, test_predictions.txt), pairwise-truncated
    val expected = Map(
      "Anatomical" -> (793L, 1017L, 944L),
      "Diseases" -> (354L, 431L, 441L),
      "Drug" -> (156L, 169L, 173L),
      "Image" -> (80L, 98L, 93L),
      "Laboratory" -> (121L, 165L, 150L),
      "Operation" -> (71L, 91L, 88L))
    val got = perType.collect().map(m => m.entity_type -> ((m.tp, m.pred_count, m.gold_count))).toMap
    assert(got == expected)

    assert(micro.tp == 1575L && micro.pred_count == 1971L && micro.gold_count == 1889L)
    assert(math.abs(micro.precision - 1575.0 / 1971.0) < 1e-12)
    assert(math.abs(micro.recall - 1575.0 / 1889.0) < 1e-12)
  }

  test("verbose prediction dump reproduces test_predictions_verbose.txt byte-for-byte") {
    assume(refAvailable)
    val artifact = "/root/reference/results/test_predictions_verbose.txt"
    assume(new java.io.File(artifact).isFile)
    val gold = BioCorpus.readIndexed(spark, s"$refData/test.txt")
    val pred = BioCorpus.readIndexed(spark, "/root/reference/results/test_predictions.txt")
    val blocks = ReferenceEval.predictionDumpVerbose(gold, pred)
      .orderBy("id", "span_idx")
      .collect().map(_.getString(2))
    // artifact layout: header + blank-line-separated per-sentence blocks
    val ours = ReferenceEval.VerboseHeader + "\n" + blocks.mkString("\n\n")
    val theirs = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(artifact)),
      java.nio.charset.StandardCharsets.UTF_8).stripLineEnd
    assert(ours.linesIterator.size == theirs.linesIterator.size,
      s"line counts differ: ${ours.linesIterator.size} vs ${theirs.linesIterator.size}")
    ours.linesIterator.zip(theirs.linesIterator).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"line $i differs:\n ours:   [$a]\n theirs: [$b]")
    }
  }

  test("classification_report.txt renders byte-for-byte against the reference artifact") {
    assume(refAvailable)
    val artifact = "/root/reference/results/classification_report.txt"
    assume(new java.io.File(artifact).isFile)
    val gold = BioCorpus.readIndexed(spark, s"$refData/test.txt")
    val pred = BioCorpus.readIndexed(spark, "/root/reference/results/test_predictions.txt")
    val (perType, micro) = ReferenceEval.evaluate(gold, pred)
    val rows = graft.metrics.SpanMetrics.report(perType)
    val ours = graft.metrics.SpanMetrics.classificationReportText(rows) + "\n" +
      graft.metrics.SpanMetrics.overallSummaryLine(micro)
    val theirs = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(artifact)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(ours.linesIterator.size == theirs.linesIterator.size,
      s"line counts differ: ${ours.linesIterator.size} vs ${theirs.linesIterator.size}")
    ours.linesIterator.zip(theirs.linesIterator).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"line $i differs:\n ours:   [$a]\n theirs: [$b]")
    }
    assert(ours == theirs, "byte-level mismatch (line endings / trailing bytes)")
  }

  test("triple parity: distributed assembly over the reference's OWN predictions matches local reference semantics exactly (P=R=1)") {
    val spark2 = spark
    import spark2.implicits._
    // the reference's emitted tags on its real test set → our DISTRIBUTED
    // path (BIO scan → decodeBio flatMap → surface-link → co-occurrence
    // assembly) must produce exactly the triples a sequential
    // reference-semantics loop derives. P=R=1.0 here IS the north-rule
    // "triples match the reference's output at P/R ≥ 0.95" on real data.
    val pred = graft.data.BioCorpus.readIndexed(spark, "/root/reference/results/test_predictions.txt")
    val mentions = pred.flatMap { ts =>
      graft.core.Bio.decodeBio(ts.chars.toIndexedSeq, ts.tags.toIndexedSeq).map {
        case (tpe, text, s, e, _) => graft.core.Mention(ts.doc_id, ts.span_idx, tpe, text, s, e, 1.0)
      }
    }
    val emptyLex = spark.emptyDataset[graft.core.LexiconEntry]
    val linked = graft.link.Linker.link(mentions, emptyLex) // all surface-linked: S:<text>
    val got = graft.assemble.Triples.assemble(linked)
      .collect().map(t => (t.subj, t.pred, t.obj, t.doc_id)).toSet

    // local reference-semantics derivation (sequential driver loop)
    val expected = pred.collect().flatMap { ts =>
      val ms = graft.core.Bio.decodeBio(ts.chars.toIndexedSeq, ts.tags.toIndexedSeq)
      val concepts = ms.map { case (tpe, text, _, _, _) => (tpe, "S:" + text) }.distinct
      for {
        (st, sc) <- concepts if st == "Diseases"
        (ot, oc) <- concepts
        pred2 <- graft.assemble.Triples.Rules.get((st, ot))
      } yield (sc, pred2, oc, ts.doc_id)
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty, "reference predictions produced no triples")
  }

  test("seqevalEntities implements the conlleval start rules") {
    // I-X after O starts a chunk (unlike the reference's own decoder)
    assert(Bio.seqevalEntities(IndexedSeq("O", "I-Drug", "I-Drug")) == Seq(("Drug", 1, 3)))
    // leading I-X starts a chunk
    assert(Bio.seqevalEntities(IndexedSeq("I-Drug")) == Seq(("Drug", 0, 1)))
    // type change inside I-run splits
    assert(Bio.seqevalEntities(IndexedSeq("B-Drug", "I-Diseases")) ==
      Seq(("Drug", 0, 1), ("Diseases", 1, 2)))
    // B after B splits
    assert(Bio.seqevalEntities(IndexedSeq("B-Drug", "B-Drug")) ==
      Seq(("Drug", 0, 1), ("Drug", 1, 2)))
  }
}
