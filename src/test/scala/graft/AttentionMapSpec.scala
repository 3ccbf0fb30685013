package graft

import graft.explain.AttentionMap
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the mean-attention explainability analog (SURVEY §2.6 A10). */
class AttentionMapSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def corpus = {
    import spark.implicits._
    // "abcdefgh": mention [2,5) Disease; "xyz": mention [0,2) Drug + O tail
    val sentences = Seq(("d1", 0, "abcdefgh"), ("d1", 1, "xyz"))
      .toDF("doc_id", "span_idx", "text")
    val mentions = Seq(
      ("d1", 0, "Disease", 2, 5),
      ("d1", 1, "Drug", 0, 2)).toDF("doc_id", "span_idx", "entity_type", "start", "end")
    (sentences, mentions)
  }

  test("meanTokenAttention: closed-form row means (8·len/L in-span, 2/L outside)") {
    val (sentences, mentions) = corpus
    val got = AttentionMap.meanTokenAttention(sentences, mentions)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2, t._3))
    val expect =
      (0 until 8).map { p =>
        if (p >= 2 && p < 5) ("d1", 0, p, "Disease", 3.0) // 8*3/8
        else ("d1", 0, p, "O", 0.25) // 2/8
      } ++ (0 until 3).map { p =>
        if (p < 2) ("d1", 1, p, "Drug", 5.333333) // round(8*2/3, 6)
        else ("d1", 1, p, "O", 0.666667) // round(2/3, 6)
      }
    assert(got.toSeq == expect)
  }

  test("attentionMatrix: sparse cells, and its row means reproduce meanTokenAttention") {
    import org.apache.spark.sql.functions._
    val (sentences, mentions) = corpus
    val cells = AttentionMap.attentionMatrix(sentences, mentions)
    // sentence 0: 3x3 span block + 5 O-diagonal cells; sentence 1: 2x2 + 1
    val counts = cells.groupBy("doc_id", "span_idx").count()
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(counts == Map(0 -> 14L, 1 -> 5L))
    // every cell is symmetric: A[i][j] == A[j][i]
    val asSet = cells.collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toSet
    assert(asSet.forall { case (s, i, j, a) => asSet.contains((s, j, i, a)) })
    // row mean over the FULL row (zeros included): sum(att)/L == meanTokenAttention
    val lens = sentences.select(col("doc_id"), col("span_idx"),
      length(col("text")).as("len"))
    val rowMeans = cells.groupBy("doc_id", "span_idx", "i").agg(sum("att").as("s"))
      .join(lens, Seq("doc_id", "span_idx"))
      .select(col("doc_id"), col("span_idx"), col("i").as("pos"),
        round(col("s") / col("len"), 6).as("mean_att"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val direct = AttentionMap.meanTokenAttention(sentences, mentions)
      .select("doc_id", "span_idx", "pos", "mean_att")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(rowMeans.toSeq == direct.toSeq)
  }
}
