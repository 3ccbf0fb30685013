package graft

import graft.checkpoint.Resumable
import graft.data.{DocsGen, Lexicon}
import graft.pipeline.KgPipeline
import graft.tables.Icebergish
import org.apache.spark.sql.functions.lit
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

  test("compaction rewrites many small appends into one snapshot; history and time travel survive") {
    import spark.implicits._
    val root = tmpDir("icebergish_compact")
    // simulate streaming: many tiny pred-partitioned appends
    val preds = Seq("treated_by", "has_finding", "located_in")
    (0 until 6).foreach { i =>
      Icebergish.commit(
        Seq((s"d$i", s"s$i", preds(i % 3), s"o$i")).toDF("doc_id", "subj", "pred", "obj"),
        root, "append", partitionBy = Seq("pred"))
    }
    val sLast = Icebergish.currentSnapshotId(spark, root).get
    val before = Icebergish.read(spark, root)
      .select("doc_id", "subj", "pred", "obj").as[(String, String, String, String)].collect().toSet
    val filesBefore = Icebergish.fileSet(spark, root, sLast).size

    val sc = Icebergish.compact(spark, root, partitionBy = Seq("pred"), targetFiles = 1)
    val after = Icebergish.read(spark, root)
      .select("doc_id", "subj", "pred", "obj").as[(String, String, String, String)].collect().toSet
    assert(after == before)
    // one coalesced file per partition value instead of one per append
    val filesAfter = Icebergish.fileSet(spark, root, sc).size
    assert(filesAfter == preds.size && filesAfter < filesBefore)
    // compaction is an overwrite: the chain is cut, the manifest walk is O(1)
    assert(Icebergish.readManifest(spark, root, sc).mode == "overwrite")
    // pre-compaction time travel intact (old manifests/data are immutable)
    assert(Icebergish.read(spark, root, Some(sLast))
      .select("doc_id", "subj", "pred", "obj").as[(String, String, String, String)]
      .collect().toSet == before)
  }

  test("schema evolution: a snapshot written before a column existed reads as null for it") {
    import spark.implicits._
    val root = tmpDir("icebergish_evolve")
    Icebergish.commit(Seq((1, "a")).toDF("id", "v"), root)
    Icebergish.commit(Seq((2, "b", 0.5)).toDF("id", "v", "score"), root, "append")
    val rows = Icebergish.read(spark, root).select("id", "v", "score")
      .collect().map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(rows == Set((1, "a", None), (2, "b", Some(0.5))))
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

  test("a crash BETWEEN the triples commit and the progress write neither duplicates nor loses a chunk") {
    import spark.implicits._
    val g = DocsGen.gen(spark, 200, seed = 7).cache()
    val docs = DocsGen.docs(g)
    val lex = Lexicon.fromSurfaces(DocsGen.vocabEntries.toDS()).cache()
    val triplesRoot = tmpDir("triples3")
    val progressRoot = tmpDir("progress3")

    // chunks 0 and 1 complete normally, then the run dies
    intercept[RuntimeException] {
      Resumable.run(docs, lex, triplesRoot, progressRoot, 4, "r1", failAfterChunks = 2)
    }
    // simulate the torn window for chunk 2: its DATA commit (with the
    // manifest tag) succeeded, the progress write never happened
    val staged = Resumable.stagedChunk(spark, s"$progressRoot/_staging", 2)
    val (t2, cleanup2) = KgPipeline.runWithCleanup(staged, lex)
    Icebergish.commit(t2.toDF().withColumn("chunk", lit(2)), triplesRoot, "append",
      partitionBy = Seq("pred"), tag = Some("chunk-kg-2"))
    cleanup2()
    assert(Resumable.completedChunks(spark, progressRoot) == Set(0, 1)) // progress says 2 is NOT done

    // restart: chunk 2 must NOT re-run (its tag proves the commit); its
    // progress row is healed; chunk 3 runs normally
    val resumed = Resumable.run(docs, lex, triplesRoot, progressRoot, 4, "r2")
    assert(resumed.map(_.chunk).sorted == Seq(2, 3))
    val healed = resumed.find(_.chunk == 2).get
    assert(healed.triples == t2.count() && healed.docs > 0 && healed.input_hash != 0L)
    assert(Resumable.completedChunks(spark, progressRoot) == Set(0, 1, 2, 3))
    // exactly-once: table total equals a direct full run, no duplication
    assert(Icebergish.read(spark, triplesRoot).count() == KgPipeline.run(docs, lex).count())
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
