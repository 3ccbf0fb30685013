package graft.ops

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; dot products via `zip_with`/`aggregate`
  *    higher-order functions (pure Catalyst, codegen'd, no UDF); top-k via
  *    a window partitioned by query. This is the correctness baseline and
  *    is already the right plan at scale when |queries| is small: one scan,
  *    no shuffle of the corpus, only (|queries| × k) rows shuffle for the
  *    final ranking.
  *  - `lshTopK`: the scale path when |queries| is large — random-hyperplane
  *    LSH buckets both sides on a shared sign-bit prefix so the join is an
  *    equi-join on bucket, then exact cosine ranks within candidates.
  */
object Similarity {

  private def dotCol(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")), lit(0.0), (acc, v) => acc + v)

  private def normCol(x: Column): Column = sqrt(dotCol(x, x))

  /** Exact cosine top-k for each query vector.
    * @param corpus  (idCol, vecCol) table
    * @param queries (idCol, vecCol) table — must be broadcast-small
    * @return (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken
    *         by neighbor id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotCol(col("cv"), col("qv")) /
          greatest(normCol(col("cv")) * normCol(col("qv")), lit(1e-12)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: both sides keyed by `planes` sign bits; candidates
    * share a bucket (multi-probe over single-bit flips raises recall).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      planes: Int = 8,
      probes: Int = 4): DataFrame = {
    val planeVecs: Array[Array[Double]] =
      Array.tabulate(planes)(p => Array.tabulate(dim)(d =>
        Hashing.uniformDouble(Hashing.hash2(0xA55, p * 1024 + d)) * 2 - 1))
    val sign = udf((v: Seq[Float]) => {
      var key = 0L; var p = 0
      while (p < planes) {
        var dot = 0.0; var d = 0
        val n = math.min(dim, v.length)
        while (d < n) { dot += planeVecs(p)(d) * v(d); d += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      key
    })
    // multi-probe: query also lands in buckets at Hamming distance 1
    val probeBuckets = udf((key: Long) => {
      val out = scala.collection.mutable.ArrayBuffer(key)
      var p = 0
      while (p < planes && out.length < probes) { out += (key ^ (1L << p)); p += 1 }
      out.toSeq
    })
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", sign(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", explode(probeBuckets(sign(col("qv")))))
    val scored = c
      .join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotCol(col("cv"), col("qv")) /
          greatest(normCol(col("cv")) * normCol(col("qv")), lit(1e-12)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
