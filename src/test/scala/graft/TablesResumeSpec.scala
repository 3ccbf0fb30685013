package graft

import graft.checkpoint.Resumable
import graft.data.{DocsGen, Lexicon}
import graft.pipeline.KgPipeline
import graft.tables.Icebergish
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TablesResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("docs read FROM an Icebergish table run the pipeline with the span-sequence invariant intact") {
    import spark.implicits._
    val root = tmpDir("docs_table")
    val g = DocsGen.gen(spark, 120, seed = 5)
    val direct = DocsGen.docs(g)
    Icebergish.commit(direct.toDF(), root)
    val fromTable = Icebergish.read(spark, root).as[graft.core.Doc]

    // per-row span-sequence equality (kind, text, media_ref, order) — the
    // north-rule invariant — survives the table round-trip
    val sigDirect = KgPipeline.spanSignature(direct.toDF())
      .as[(String, String)].collect().toMap
    val sigTable = KgPipeline.spanSignature(fromTable.toDF())
      .as[(String, String)].collect().toMap
    assert(sigTable == sigDirect)

    val lex = Lexicon.fromSurfaces(DocsGen.vocabEntries.toDS()).cache()
    val fromTableTriples = KgPipeline.run(fromTable, lex)
      .collect().map(t => (t.subj, t.pred, t.obj, t.doc_id)).toSet
    val directTriples = KgPipeline.run(direct, lex)
      .collect().map(t => (t.subj, t.pred, t.obj, t.doc_id)).toSet
    assert(fromTableTriples == directTriples && fromTableTriples.nonEmpty)
    lex.unpersist()
  }

  test("icebergish commit/read round-trips, appends accumulate, overwrite cuts history") {
    import spark.implicits._
    val root = tmpDir("icebergish")
    val s1 = Icebergish.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), root)
    assert(Icebergish.read(spark, root).count() == 2)
    val s2 = Icebergish.commit(Seq((3, "c")).toDF("id", "v"), root, "append")
    assert(Icebergish.read(spark, root).count() == 3)
    // time travel to snapshot 1
    assert(Icebergish.read(spark, root, Some(s1)).count() == 2)
    val s3 = Icebergish.commit(Seq((9, "z")).toDF("id", "v"), root, "overwrite")
    assert(Icebergish.read(spark, root).count() == 1)
    assert(Icebergish.read(spark, root, Some(s2)).count() == 3)
    assert(Icebergish.currentSnapshotId(spark, root).contains(s3))
  }

  test("resumable run completes all chunks and a restart is a no-op") {
    import spark.implicits._
    val g = DocsGen.gen(spark, 200, seed = 5).cache()
    val docs = DocsGen.docs(g)
    val lex = Lexicon.fromSurfaces(DocsGen.vocabEntries.toDS()).cache()
    val triplesRoot = tmpDir("triples")
    val progressRoot = tmpDir("progress")

    val p1 = Resumable.run(docs, lex, triplesRoot, progressRoot, nChunks = 4, runId = "r1")
    assert(p1.map(_.chunk).sorted == Seq(0, 1, 2, 3))
    assert(p1.map(_.docs).sum == 200)
    val total = Icebergish.read(spark, triplesRoot).count()
    val direct = KgPipeline.run(docs, lex).count()
    assert(total == direct)

    // restart: nothing left to do
    val p2 = Resumable.run(docs, lex, triplesRoot, progressRoot, nChunks = 4, runId = "r2")
    assert(p2.isEmpty)
    assert(Icebergish.read(spark, triplesRoot).count() == total)
    g.unpersist(); lex.unpersist()
  }

  test("a crash mid-run resumes from the completed-chunk frontier") {
    import spark.implicits._
    val g = DocsGen.gen(spark, 200, seed = 6).cache()
    val docs = DocsGen.docs(g)
    val lex = Lexicon.fromSurfaces(DocsGen.vocabEntries.toDS()).cache()
    val triplesRoot = tmpDir("triples2")
    val progressRoot = tmpDir("progress2")

    intercept[RuntimeException] {
      Resumable.run(docs, lex, triplesRoot, progressRoot, 4, "r1", failAfterChunks = 2)
    }
    val doneAfterCrash = Resumable.completedChunks(spark, progressRoot)
    assert(doneAfterCrash.size == 2)

    val resumed = Resumable.run(docs, lex, triplesRoot, progressRoot, 4, "r1b")
    assert(resumed.map(_.chunk).toSet == (Set(0, 1, 2, 3) -- doneAfterCrash))
    assert(Icebergish.read(spark, triplesRoot).count() == KgPipeline.run(docs, lex).count())
    // lineage recorded per chunk
    val prog = Icebergish.read(spark, progressRoot)
    assert(prog.count() == 4)
    assert(prog.select("input_hash").collect().forall(_.getLong(0) != 0L))
    g.unpersist(); lex.unpersist()
  }
}
