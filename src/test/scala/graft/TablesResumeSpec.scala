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

  test("partitioned commits recover partition columns, prune by predicate, and mix with unpartitioned history") {
    import spark.implicits._
    val root = tmpDir("icebergish_part")
    // legacy unpartitioned append first — the chain must still align
    Icebergish.commit(Seq(("d0", "s0", "treated_by", "o0")).toDF("doc_id", "subj", "pred", "obj"), root)
    val s2 = Icebergish.commit(
      Seq(("d1", "s1", "treated_by", "o1"), ("d2", "s2", "has_finding", "o2"))
        .toDF("doc_id", "subj", "pred", "obj"),
      root, "append", partitionBy = Seq("pred"))
    val all = Icebergish.read(spark, root)
    assert(all.count() == 3)
    // the hive partition column is recovered with its values
    assert(all.select("pred").as[String].collect().sorted
      === Array("has_finding", "treated_by", "treated_by"))
    // partitioned snapshot lays files under pred=... dirs
    val m = Icebergish.readManifest(spark, root, s2)
    assert(m.partitionBy == Seq("pred"))
    assert(m.files.forall(f => f.contains("pred=")))
    // a single-predicate read touches only that predicate's files: the
    // pushed filter prunes the partitioned snapshot's scan to one dir
    val one = all.filter($"pred" === "has_finding")
    assert(one.count() == 1)
    val scanned = one.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.totalNumberOfFiles
    }.sum
    // 1 file from the pruned partitioned snapshot + 1 unpartitioned legacy file
    assert(scanned <= 2, s"expected partition-pruned scan, read $scanned files")
    // overwrite with a partitioned snapshot cuts history; time travel still sees 3
    val s3 = Icebergish.commit(
      Seq(("d9", "s9", "located_in", "o9")).toDF("doc_id", "subj", "pred", "obj"),
      root, "overwrite", partitionBy = Seq("pred"))
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
