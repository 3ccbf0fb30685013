package graft

import graft.assemble.Triples
import graft.canon.Canon
import graft.core._
import graft.data.{DocsGen, Lexicon}
import graft.link.Linker
import graft.metrics.SpanMetrics
import graft.pipeline.KgPipeline
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def lexiconFromVocab() = {
    val spark2 = spark
    import spark2.implicits._
    Lexicon.fromSurfaces(DocsGen.vocabEntries.toDS())
  }

  test("span-sequence invariant: signature identical before and after the pipeline reads docs") {
    val g = DocsGen.gen(spark, 100, seed = 21).cache()
    val docs = DocsGen.docs(g)
    val before = KgPipeline.spanSignature(docs.toDF()).collect().map(r => (r.getString(0), r.getString(1))).toMap
    // run the pipeline (reads docs; must not mutate them), then re-sign
    KgPipeline.run(docs, lexiconFromVocab()).count()
    val after = KgPipeline.spanSignature(docs.toDF()).collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(before == after)
    g.unpersist()
  }

  test("driver-local surface resolution equals the distributed scorer bit-for-bit") {
    val spark2 = spark
    import spark2.implicits._
    val lex = lexiconFromVocab().cache()
    val lexRows = lex.collect().toSeq
    // vocab surfaces (exact matches), unknown-but-prefix-sharing surfaces
    // (candidates via blocking keys, no exact boost), fully unknown and
    // empty surfaces (S: fallback), and a wrong-type probe
    val surfaces: Seq[(String, String)] =
      DocsGen.vocabEntries ++ Seq(
        ("高血压", "Diseases"), ("高血压病史", "Diseases"), ("胃", "Anatomical"),
        ("阿司", "Drug"), ("zz", "Drug"), ("", "Diseases"), ("高血压病", "Drug"))
    val local = Linker.surfaceResolutionLocal(surfaces, lexRows)
      .map { case (t, tp, c, s) => (t, tp, c, s) }.toSet
    val dist = Linker.surfaceResolution(surfaces.toDS(), lex).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(local == dist) // exact doubles, exact concept ids
    lex.unpersist()
  }

  test("linker links exact-surface mentions to their lexicon concept") {
    val spark2 = spark
    import spark2.implicits._
    val lex = lexiconFromVocab().cache()
    val bySurface = lex.collect().map(e => e.surface -> e.concept_id).toMap
    val mentions = Seq(
      Mention("d1", 0, "Diseases", "胃癌", 0, 2, 1.0),
      Mention("d1", 1, "Drug", "阿司匹林", 3, 7, 1.0),
      Mention("d2", 0, "Diseases", "不在词典里", 0, 5, 1.0)
    ).toDS()
    val linked = Linker.link(mentions, lex).collect().map(l => (l.text, l.concept_id)).toMap
    assert(linked("胃癌") == bySurface("胃癌"))
    assert(linked("阿司匹林") == bySurface("阿司匹林"))
    assert(linked("不在词典里") == "S:不在词典里") // unlinked → surface node
    lex.unpersist()
  }

  test("connected components unifies star graphs, handles chains") {
    val spark2 = spark
    import spark2.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), // chain a-b-c
      ("x", "y"), // pair
      ("q", "q") // self-loop singleton
    ).toDF("src", "dst")
    val comp = Canon.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp("a") == "a" && comp("b") == "a" && comp("c") == "a")
    assert(comp("x") == "x" && comp("y") == "x")
    assert(comp("q") == "q")
  }

  test("pipeline output is identical under different partitionings (determinism under parallelism)") {
    val spark2 = spark
    import spark2.implicits._
    val g = DocsGen.gen(spark, 200, seed = 13).cache()
    val docs = DocsGen.docs(g)
    val lex = lexiconFromVocab().cache()
    def run(parts: Int) = KgPipeline.run(docs, lex, numPartitions = parts)
      .collect().map(t => (t.subj, t.pred, t.obj, t.doc_id)).toSeq.sorted
    val a = run(3)
    val b = run(17)
    assert(a == b && a.nonEmpty)
    g.unpersist(); lex.unpersist()
  }

  test("end-to-end: pipeline triples match gold-derived triples exactly (P=R=1)") {
    val spark2 = spark
    import spark2.implicits._
    val g = DocsGen.gen(spark, 300, seed = 42).cache()
    val docs = DocsGen.docs(g)
    val lex = lexiconFromVocab().cache()

    // gold triples: same rules applied to gold mentions linked by surface
    val goldLinked = Linker.link(DocsGen.goldMentions(g), lex)
    val goldTriples = Triples.assemble(goldLinked)
      .collect().map(t => (t.subj, t.pred, t.obj, t.doc_id)).toSet

    val gotTriples = KgPipeline.run(docs, lex)
      .collect().map(t => (t.subj, t.pred, t.obj, t.doc_id)).toSet

    // canonicalization maps concept → component; gold triples above are
    // concept-level. Components of a star rooted at one surface node per
    // concept keep concepts distinct unless surfaces collide, so compare
    // through the same canonical map for strict equality:
    val edges = goldLinked
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("S:"),
        $"text").as("src"), $"concept_id".as("dst"))
      .distinct()
    val canon = Canon.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val goldCanon = goldTriples.map { case (s, p, o, d) =>
      (canon.getOrElse(s, s), p, canon.getOrElse(o, o), d)
    }
    assert(gotTriples == goldCanon)
    assert(gotTriples.nonEmpty)
    g.unpersist(); lex.unpersist()
  }

  test("span metrics reproduce hand-computed P/R/F1") {
    val spark2 = spark
    import spark2.implicits._
    val gold = Seq(
      Mention("d", 0, "Diseases", "胃癌", 0, 2, 1.0),
      Mention("d", 0, "Drug", "头孢", 5, 7, 1.0),
      Mention("d", 1, "Diseases", "肺炎", 1, 3, 1.0)
    ).toDS()
    val pred = Seq(
      Mention("d", 0, "Diseases", "胃癌", 0, 2, 1.0), // TP
      Mention("d", 0, "Drug", "头孢", 4, 6, 1.0), // wrong offsets → FP
      Mention("d", 1, "Anatomical", "肺叶", 1, 3, 1.0) // wrong type → FP
    ).toDS()
    val per = SpanMetrics.perType(pred, gold)
    val micro = SpanMetrics.micro(per)
    assert(micro.tp == 1 && micro.pred_count == 3 && micro.gold_count == 3)
    assert(math.abs(micro.precision - 1.0 / 3) < 1e-9)
    assert(math.abs(micro.recall - 1.0 / 3) < 1e-9)
  }
}
