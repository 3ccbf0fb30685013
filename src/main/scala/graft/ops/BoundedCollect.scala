package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Bounded collect-list aggregator (r6): gathers a group's rows into one
  * array-typed buffer CAPPED at `cap + 1` entries — the building block of
  * the posting-list dedup plans ([[Dedup]]) and the single-action
  * adaptive gate of connected components ([[graft.canon.Canon]]).
  *
  * Cap correctness: a group with ≤ cap total rows never truncates (every
  * partial buffer holds ≤ total entries), so its collected list is
  * complete; a group with > cap rows merges to ≥ cap+1 entries (capped AT
  * cap+1), which the caller's `length <= cap` test detects — the same
  * decision an exact count would make, for bounded memory and ONE pass.
  * Element order is partition-dependent; callers must be order-invariant
  * (unordered pair emission, union-find).
  */
private[graft] class BoundedCollectAgg(cap: Int, inSchema: StructType)
    extends Aggregator[Row, Row, Row] {
  private val bufSchema =
    StructType(Seq(StructField("items", ArrayType(inSchema, containsNull = false))))
  private def grow(items: Seq[Row], a: Row): Row = items match {
    // in-place append on the warm path: the buffer object lives across
    // reduce() calls, so the ArrayBuffer append is O(1) amortized (an
    // immutable `:+` would be O(n) per row — O(n²) per hot key)
    case ab: scala.collection.mutable.ArrayBuffer[Row @unchecked] =>
      ab += a
      Row(ab)
    case other =>
      Row(scala.collection.mutable.ArrayBuffer.empty[Row] ++= other += a)
  }
  override def zero: Row = Row(scala.collection.mutable.ArrayBuffer.empty[Row])
  override def reduce(b: Row, a: Row): Row = {
    val items = b.getSeq[Row](0)
    if (items.length > cap) b else grow(items, a)
  }
  override def merge(a: Row, b: Row): Row = {
    val xs = a.getSeq[Row](0)
    val ys = b.getSeq[Row](0)
    if (ys.isEmpty) a
    else if (xs.isEmpty) b
    else Row((scala.collection.mutable.ArrayBuffer.empty[Row] ++= xs ++= ys).take(cap + 1))
  }
  override def finish(r: Row): Row = r
  override def bufferEncoder: Encoder[Row] = Encoders.row(bufSchema)
  override def outputEncoder: Encoder[Row] = Encoders.row(bufSchema)
}

private[graft] object BoundedCollect {
  /** The udaf column: `collect(cap, schema)(cols...)` → struct with an
    * `items` array of up-to-cap+1 member structs.
    */
  def agg(cap: Int, inSchema: StructType): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedCollectAgg(cap, inSchema), Encoders.row(inSchema))
}
