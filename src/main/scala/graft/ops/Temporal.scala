package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins (SURVEY brief's named
  * examples: as-of join, range join), implemented with the scalable
  * idioms rather than per-row joins:
  *
  *  - [[asOfJoin]]: union-tag + one keyed window pass — each left row
  *    picks up the latest right row with `right.ts <= left.ts` per key.
  *    ONE shuffle by key, no join explosion, no per-row subquery; the
  *    window is key-partitioned (never global).
  *  - [[rangeJoinCount]]: the bucketed range join — both sides key on a
  *    coarse time bucket (left exploded to adjacent buckets), equi-join,
  *    then the exact range filter. Candidates are bounded by bucket
  *    width, so the plan is a hash join, never a cartesian/BNLJ.
  */
object Temporal {

  /** For each left row, attach `valueCol` of the LATEST right row with
    * the same `keyCol` and `right.tsCol <= left.tsCol` (inclusive — the
    * standard backward as-of). Right rows sharing (key, ts) must be
    * pre-deduplicated by the caller for a deterministic match.
    *
    * @return the left rows + `<valueCol>_asof` (null when no prior right
    *         row exists)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val asofCol = s"${valueCol}_asof"
    val leftCols = left.columns
    val l = left
      .withColumn("__is_left", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(0).as("__is_left"), col(valueCol).as("__rv"))
    // align schemas: left's payload columns become null on right rows
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    // right rows sort BEFORE left rows at the same timestamp, so an
    // equal-ts right row is visible to the left row (inclusive as-of)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn(asofCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__rv")
  }

  /** Count, for each left row, the right rows with the same key whose
    * timestamp lies within ±`rangeUs` microseconds — the bucketed range
    * join: explode the left side into its bucket and both neighbors,
    * equi-join on (key, bucket), exact filter, partial-agg count. The
    * candidate set per left row is bounded by 3 buckets of right rows;
    * no cartesian product at any scale.
    *
    * @param leftTsUs / rightTsUs microsecond-epoch timestamp columns
    * @return left's (idCol, key, ts) + `n_in_range`
    */
  def rangeJoinCount(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      idCol: String,
      leftTsUs: Column,
      rightTsUs: Column,
      rangeUs: Long): DataFrame = {
    val l = left.select(
      col(idCol), col(keyCol), leftTsUs.as("__lts"),
      explode(array(lit(-1L), lit(0L), lit(1L))).as("__db"))
      .withColumn("__bucket", floor(col("__lts") / rangeUs) + col("__db"))
      .drop("__db")
    val r = right.select(col(keyCol), rightTsUs.as("__rts"))
      .withColumn("__bucket", floor(col("__rts") / rangeUs))
    // LEFT join + conditional count: every left row survives, with
    // n_in_range = 0 when no right row lands in range (ADVICE r3: the
    // inner-join formulation silently dropped zero-match left rows). The
    // in-range test lives in the COUNT, not a filter — a left row whose
    // candidate buckets hold only out-of-range rows must still emit 0.
    l.join(r, Seq(keyCol, "__bucket"), "left")
      .groupBy(col(idCol), col(keyCol), col("__lts").as("ts_us"))
      .agg(count(when(abs(col("__rts") - col("__lts")) <= rangeUs, lit(1))).as("n_in_range"))
      .select(col(idCol), col(keyCol), col("ts_us"), col("n_in_range"))
  }
}
