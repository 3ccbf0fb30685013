package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing — the LLM-training batch-assembly operator: group
  * documents into packs whose total token count stays within a fixed
  * capacity (greedy sequential fill), so downstream training reads
  * near-full fixed-size batches instead of padding to the longest doc.
  *
  * Scale + determinism design: a GLOBAL greedy pack is a sequential scan
  * — unusable at 100 TB and dependent on row order. Instead documents are
  * assigned to fixed id-BLOCKS (`block = id / blockSize`) and each block
  * packs independently in id order. Blocks are a pure function of ids —
  * NOT of partitioning — so the result is identical for any partition
  * count or row order, and packing parallelizes embarrassingly (one
  * bounded group per block through `flatMapGroups`). The only shuffle is
  * the groupBy on the block id; rows carry (id, tokens) — never text.
  *
  * Packing rule (shared with the DuckDB oracle): walk the block's docs in
  * id order, keeping a running pack; a doc that would push the running
  * total past `capacity` starts the next pack. A single doc larger than
  * `capacity` therefore occupies a pack of its own (oversized packs are
  * visible as `pack_tokens > capacity` for the caller to truncate or
  * reject — silently splitting a document is not this operator's call).
  */
object Packing {

  /** @param df        input with `idCol` (castable to long, unique) and
    *                  `tokensCol` (castable to long, ≥ 0)
    * @param capacity  max token sum per pack (soft for oversized singletons)
    * @param blockSize docs per independent packing block
    * @return (idCol, n_tokens, pack_block, pack_seq, pack_tokens) — one
    *         row per input doc; (pack_block, pack_seq) identifies the
    *         pack, pack_tokens is its total (repeated on each member).
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      capacity: Long,
      blockSize: Int = 1024): DataFrame = {
    require(capacity > 0 && blockSize > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("n_tokens"))
      .as[(Long, Long)]
      .groupByKey(_._1 / blockSize)
      .flatMapGroups { (block, it) =>
        val docs = it.toArray.sortBy(_._1) // ≤ blockSize rows, bounded
        var seq = 0L
        var acc = 0L
        val out = new Array[(Long, Long, Long, Long)](docs.length)
        var i = 0
        while (i < docs.length) {
          val (id, tok) = docs(i)
          if (i > 0 && acc + tok > capacity) { seq += 1; acc = 0L }
          acc += tok
          out(i) = (id, tok, block, seq)
          i += 1
        }
        out.iterator
      }(Encoders.product[(Long, Long, Long, Long)])
      .toDF("id", "n_tokens", "pack_block", "pack_seq")
    // pack totals via a partial-agg join back on the (block, seq) key —
    // bounded fan-in (≤ blockSize rows per key)
    val totals = packed.groupBy("pack_block", "pack_seq")
      .agg(sum("n_tokens").as("pack_tokens"))
    packed.join(totals, Seq("pack_block", "pack_seq"))
      .select(col("id").as(idCol), col("n_tokens"),
        col("pack_block"), col("pack_seq"), col("pack_tokens"))
  }
}
