package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source keyword profiles by tf-idf — "what characterizes each
  * source's vocabulary" over a document corpus (the corpus-analytics
  * companion to [[TextAnalysis]]'s per-document scores).
  *
  * `score(s, t) = tf(s, t) * N / df(t)` — term frequency within the
  * source, times the idf RATIO `N / df` (document count over document
  * frequency). The conventional `ln(N/df)` damping is deliberately not
  * applied: the ratio form ranks identically per token, and `tf * N / df`
  * is exact integer arithmetic in IEEE doubles (one correctly-rounded
  * division), so the DuckDB oracle reproduces scores bit-for-bit where a
  * libm `ln` could drift a ulp between engines.
  *
  * Scale shape: the corpus-sized stages are one explode + two partially-
  * aggregated groupBys ((doc, token) distinct for df, (source, token)
  * counts for tf). Everything after is VOCABULARY-bounded — in particular
  * the top-k rank runs on the (source, token) aggregate, not the corpus,
  * which is why a window is acceptable here where the corpus-sized top-k
  * queries use the bounded [[TopK]] aggregator instead.
  */
object TfIdf {

  /** Top-`k` tokens per source: (source, token, tf, df, score, rank),
    * ranked by rounded score descending with token-ascending tie-break.
    */
  def topTermsPerSource(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val n = docs.count() // one bounded scalar: corpus document count
    val tokens = docs.select(
      col(idCol).as("id"),
      col(sourceCol).as("source"),
      explode(split(lower(trim(col(textCol))), " ")).as("token"))
      .filter(col("token") =!= "")
    val docFreq = tokens.select("id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val termFreq = tokens.groupBy("source", "token").agg(count(lit(1)).as("tf"))
    val scored = termFreq.join(docFreq, "token")
      .withColumn("score",
        round(col("tf").cast("double") * lit(n.toDouble) / col("df").cast("double"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("source", "token", "tf", "df", "score", "rank")
  }
}
