package graft

import graft.functions.{ChunkText, Registry}
import org.scalatest.funsuite.AnyFunSuite

/** The graft_chunk UDTF (custom Catalyst Generator): SQL LATERAL VIEW
  * path must equal the relational chunking plan row-for-row, blank/null
  * text must generate nothing, and non-literal width/stride must be
  * rejected at plan time.
  */
class ChunkTextSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  private val sf = "/root/testdata/sf0.001"

  test("LATERAL VIEW graft_chunk equals the relational chunking query") {
    val relational = SparkEntry.queries("q_docs_chunk")(spark, sf)
    val viaUdtf = SparkEntry.queries("q_docs_chunk_sql")(spark, sf)
    assert(relational.schema.map(f => (f.name, f.dataType)) ==
      viaUdtf.schema.map(f => (f.name, f.dataType)))
    val a = relational.collect().map(_.toSeq).toSeq
    val b = viaUdtf.collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("blank and null text generate zero rows; short text yields one short chunk") {
    import spark.implicits._
    Registry.registerAll(spark)
    Seq(("d1", "alpha beta gamma"), ("d2", "   "), ("d3", null))
      .toDF("doc_id", "text").createOrReplaceTempView("chunk_text_probe")
    val rows = spark.sql(
      """SELECT doc_id, chunk_ix, tok_start, n_tok, chunk_text
        |FROM chunk_text_probe LATERAL VIEW graft_chunk(text, 64, 48) c""".stripMargin)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "d1" && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getLong(3) == 3L && r.getString(4) == "alpha beta gamma")
  }

  test("overlap: stride < width repeats boundary tokens across chunks") {
    import spark.implicits._
    Registry.registerAll(spark)
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    Seq(("d1", text)).toDF("doc_id", "text").createOrReplaceTempView("chunk_overlap_probe")
    val rows = spark.sql(
      """SELECT chunk_ix, tok_start, n_tok, chunk_text
        |FROM chunk_overlap_probe LATERAL VIEW graft_chunk(text, 4, 3) c
        |ORDER BY chunk_ix""".stripMargin).collect()
    // starts 0,3,6,9 — widths 4,4,4,1
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    assert(rows(0).getString(3) == "t1 t2 t3 t4")
    assert(rows(1).getString(3) == "t4 t5 t6 t7") // t4 shared with chunk 0
    assert(rows(3).getString(3) == "t10")
  }

  test("non-literal width or stride is rejected at plan time") {
    import spark.implicits._
    Registry.registerAll(spark)
    Seq(("d1", "a b c", 4)).toDF("doc_id", "text", "w")
      .createOrReplaceTempView("chunk_badargs_probe")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM chunk_badargs_probe LATERAL VIEW graft_chunk(text, w, 3) c").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("generator equals the relational formulation on hostile whitespace inputs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Registry.registerAll(spark)
    // randomized strings over an alphabet with spaces, tabs, newlines —
    // exercising leading/trailing control whitespace, where Spark's
    // trim (spaces only) and split limit -1 (keeps trailing empties)
    // differ from java.lang.String defaults
    val rnd = new scala.util.Random(41)
    val alphabet = "ab \t\n"
    val docs = (0 until 200).map { i =>
      (f"d$i%03d", (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    } ++ Seq(("dLT", "\talpha beta"), ("dTT", "alpha beta\n"), ("dSP", "  x  "), ("dCT", "\t"))
    val df = docs.toDF("doc_id", "text")
    df.createOrReplaceTempView("chunk_prop_probe")
    val relational = df.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(3))).as("tok_start"))
      .select(col("doc_id"),
        (col("tok_start") / 3).cast("long").as("chunk_ix"),
        col("tok_start").cast("long").as("tok_start"),
        size(slice(col("toks"), col("tok_start") + 1, lit(4))).cast("long").as("n_tok"),
        array_join(slice(col("toks"), col("tok_start") + 1, lit(4)), " ").as("chunk_text"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val viaUdtf = spark.sql(
      """SELECT doc_id, chunk_ix, tok_start, n_tok, chunk_text
        |FROM chunk_prop_probe LATERAL VIEW graft_chunk(text, 4, 3) c""".stripMargin)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(viaUdtf == relational)
  }

  test("column API builds the same generator expression") {
    val c = ChunkText.graft_chunk(org.apache.spark.sql.functions.col("text"), 64, 48)
    val expr = org.apache.spark.sql.GraftSqlBridge.expression(c)
    assert(expr.isInstanceOf[ChunkText])
    val ct = expr.asInstanceOf[ChunkText]
    assert(ct.width == 64 && ct.stride == 48)
  }
}
