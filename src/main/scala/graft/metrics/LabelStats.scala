package graft.metrics

import graft.core.{Mention, TaggedSentence}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Corpus statistics operators (SURVEY.md §2.6 A1-A3, A11):
  * label distribution with percentages (`label_statistics.py:7-41`),
  * entity-type distribution sorted desc (`predict_enhanced.py:486-497`),
  * and the sentence-length histogram behind `png/length_distribution.png`.
  */
object LabelStats {

  /** A3: tag distribution excluding `O`, with share of total — the
    * reference's Counter + percentage print (`label_statistics.py:22-41`).
    */
  def labelDistribution(corpus: Dataset[TaggedSentence]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val tags = corpus.flatMap(_.tags).toDF("tag").filter($"tag" =!= "O")
    val counts = tags.groupBy($"tag").agg(count(lit(1)).as("n"))
    // share-of-total via a broadcast 1-row cross join on the (vocabulary-
    // bounded, ≤12-row) counts — a global `sum().over(Window.partitionBy())`
    // would funnel them through a single-partition WindowExec
    val total = counts.agg(sum($"n").as("__total"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("share", round($"n" / $"__total", 6))
      .drop("__total")
      .orderBy($"n".desc, $"tag")
  }

  /** A2: entity-type counts sorted desc (`predict_enhanced.py:486-497`). */
  def entityTypeDistribution(mentions: Dataset[Mention]): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions.groupBy($"entity_type").agg(count(lit(1)).as("n")).orderBy($"n".desc, $"entity_type")
  }

  /** A11: sentence-length histogram (bucket width configurable). */
  def lengthHistogram(corpus: Dataset[TaggedSentence], bucket: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .map(_.chars.length)
      .toDF("len")
      .groupBy((floor($"len" / bucket) * bucket).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"len_bucket")
  }
}
