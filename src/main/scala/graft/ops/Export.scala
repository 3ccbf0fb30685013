package graft.ops

import graft.core.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding — the last step of a
  * training-data pipeline: break curriculum/crawl order so each training
  * shard is an unbiased corpus sample, and emit a fixed number of shard
  * files each internally ordered by the shuffle key.
  *
  * The shuffle key is `hash2(seed, id)` built from the same native Mix64
  * expression as the [[Sampling]] gates (seed half folded to a literal on
  * the driver, id half codegen'd) — a bijective avalanche permutation of
  * the id space, so the ordering is uniform, collision-free, and
  * reproducible bit-for-bit for any partitioning or cluster size.
  * Different seeds give independent shuffles (fresh epoch order without
  * rewriting data).
  *
  * Scale shape: assigning `shard`/`sort_key` is a narrow projection; the
  * only wide stage is the writer's single hash exchange on `shard` plus a
  * per-partition sort — the minimum any global shuffle-to-N-files can do.
  * No global sort, no window, no driver materialization.
  */
object Export {

  /** Annotate rows with their shuffle position: `sort_key` (the hash
    * draw) and `shard` in `[0, numShards)`.
    */
  def shuffleShard(df: DataFrame, idCol: String, numShards: Int, seed: Long): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = graft.functions.Mix64.mix64(
      lit(Hashing.mix64(seed)).bitwiseXOR(col(idCol).cast("long")))
    df.withColumn("sort_key", h)
      .withColumn("shard", pmod(col("sort_key"), lit(numShards.toLong)).cast("int"))
  }

  /** Write `df` as `numShards` shard directories (`shard=<i>/`), each
    * sorted by `sort_key`. One exchange on `shard`, then a within-task
    * sort by (shard, sort_key): the leading `shard` key satisfies the
    * partitioned writer's required ordering, so planned-write does NOT
    * insert its own shard-only sort (which would scramble `sort_key`
    * order), and each shard's file reads back in `sort_key` order.
    */
  def writeShards(df: DataFrame, idCol: String, outDir: String, numShards: Int, seed: Long): Unit =
    shuffleShard(df, idCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
