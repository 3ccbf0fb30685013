package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.data.BioCorpus
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 `bio` connector: row-identical to the RDD-based
  * `BioCorpus.read` (shared parser, shared byte-offset ids), correct
  * across byte-range splits that land mid-sentence, and column-pruned
  * at the scan.
  */
class BioSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def writeBio(lines: String): String = {
    val dir = Files.createTempDirectory("bio_src_spec")
    val f = dir.resolve("corpus.txt")
    Files.write(f, lines.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  private val sample =
    """患 B-Diseases
      |者 I-Diseases
      |
      |头 B-Anatomical
      |部 I-Anatomical
      |正 O
      |
      |malformed line with three fields
      |
      |血 B-Laboratory
      |常 O
      |""".stripMargin

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "chars", "tags").collect()
      .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[String](2)))
      .toSeq.sortBy(_._1)

  test("row-identical to BioCorpus.read on the same file (ids included)") {
    val path = writeBio(sample)
    val v2 = collectRows(spark.read.format("bio").load(path))
    val rdd = BioCorpus.read(spark, path).toDF()
      .select("doc_id", "chars", "tags").collect()
      .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[String](2)))
      .toSeq.sortBy(_._1)
    assert(v2 == rdd)
    assert(v2.size == 3) // the all-malformed block parses to zero pairs and is skipped
    assert(v2.head._2 == Seq("患", "者") && v2.head._3 == Seq("B-Diseases", "I-Diseases"))
  }

  test("byte-range splits that land mid-sentence read every block exactly once") {
    val path = writeBio(sample)
    val single = collectRows(spark.read.format("bio").load(path))
    // 16-byte splits: many ranges start and end inside sentence blocks
    val tiny = collectRows(
      spark.read.format("bio").option("maxSplitBytes", "16").load(path))
    assert(tiny == single)
    val scan = spark.read.format("bio").option("maxSplitBytes", "16").load(path)
    val parts = scan.rdd.getNumPartitions
    assert(parts > 3, s"expected many byte-range partitions, got $parts")
  }

  test("column pruning reaches the scan: a doc_id-only query prunes the arrays") {
    val path = writeBio(sample)
    val df = spark.read.format("bio").load(path).select("doc_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=doc_id"), s"pruned scan description missing:\n$p")
    assert(df.collect().map(_.getString(0)).length == 3)
  }

  test("idPrefix option controls the id scheme") {
    val path = writeBio(sample)
    val ids = spark.read.format("bio").option("idPrefix", "ref").load(path)
      .select("doc_id").collect().map(_.getString(0))
    assert(ids.forall(_.startsWith("ref-")))
  }

  test("parity with BioCorpus.read on the reference's real test corpus") {
    assume(new java.io.File("/root/reference/data/test.txt").isFile)
    val path = "/root/reference/data/test.txt"
    // force multiple splits so the boundary logic runs on real data
    val v2 = spark.read.format("bio").option("maxSplitBytes", "65536").load(path)
      .select("doc_id", "chars", "tags")
    val rdd = BioCorpus.read(spark, path).toDF().select("doc_id", "chars", "tags")
    assert(v2.count() == rdd.count())
    // exceptAll both ways — exact multiset equality, ids included
    assert(v2.exceptAll(rdd).isEmpty && rdd.exceptAll(v2).isEmpty)
  }

  test("directory input reads every part file and skips _SUCCESS-style markers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bio_src_dir").toString
    // distributed write: one sentence block per row; text writer appends
    // \n per row, so blocks arrive blank-line separated
    Seq("a B-X\nb O\n", "c B-Y\n").toDF("value")
      .repartition(2).write.mode("overwrite").text(dir)
    val rows = collectRows(spark.read.format("bio").load(dir))
    assert(rows.map(r => (r._2, r._3)).toSet ==
      Set((Seq("a", "b"), Seq("B-X", "O")), (Seq("c"), Seq("B-Y"))))
  }
}
