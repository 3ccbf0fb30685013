package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, sorted table writes for CO-LOCATED joins (SURVEY §4.2 /
  * the 100 TB playbook's "pre-partition what you join repeatedly").
  *
  * Two tables bucketed by the same key into the same bucket count join
  * with NO exchange on either side: each bucket pair is joined in place,
  * so a join that would shuffle 100 TB twice reads co-located buckets
  * instead. The right shape for artifacts joined on the same key across
  * many runs — e.g. a mentions table and a quality-score table both
  * bucketed by doc_id, or the triples table bucketed by subj for
  * repeated graph-analytics joins.
  *
  * Spark's bucketing rides the session catalog (`saveAsTable` with an
  * explicit `path`), which is metastore-backed on a real cluster and
  * in-memory in tests — the file layout and the shuffle-free plan are
  * identical either way.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner-proof
    * shape: with matching bucket specs Catalyst elides both exchanges.
    */
  def cocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
