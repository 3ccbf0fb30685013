package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BooleanType, StructField, StructType}

/** Bounded collect-list aggregator (r6): gathers a group's rows into one
  * array-typed buffer with an explicit OVERFLOW flag — the building
  * block of the posting-list dedup plans ([[Dedup]]) and the
  * single-action adaptive gates of connected components
  * ([[graft.canon.Canon]]) and the pipeline's surface resolution.
  *
  * Semantics: `over = (group row count > cap)`; `items` holds the
  * complete group iff `over = false`. The moment a buffer would exceed
  * `cap`, its items are CLEARED and only the flag survives — the global
  * answer is already determined ("too big"), so an over-cap group costs
  * one boolean on the wire, not cap+1 shipped rows (a hub bucket's
  * partial buffers collapse to a bit at the first overflow; a
  * 100 TB-scale over-gate graph costs the final merge task N booleans,
  * not N·cap rows). Groups at or under the cap never truncate: every
  * partial holds ≤ total ≤ cap entries, so the merged list is complete
  * and the flag stays false — decision-identical to an exact count.
  * Element order is partition-dependent; callers must be order-invariant
  * (unordered pair emission, union-find).
  */
private[graft] class BoundedCollectAgg(cap: Int, inSchema: StructType)
    extends Aggregator[Row, Row, Row] {
  private val bufSchema = StructType(Seq(
    StructField("items", ArrayType(inSchema, containsNull = false)),
    StructField("over", BooleanType, nullable = false)))
  private val overRow: Row = Row(Seq.empty[Row], true)
  override def zero: Row = Row(scala.collection.mutable.ArrayBuffer.empty[Row], false)
  override def reduce(b: Row, a: Row): Row = {
    if (b.getBoolean(1)) return b
    val items = b.getSeq[Row](0)
    if (items.length >= cap) overRow
    else items match {
      // in-place append on the warm path: the buffer object lives across
      // reduce() calls, so the ArrayBuffer append is O(1) amortized (an
      // immutable `:+` would be O(n) per row — O(n²) per hot key)
      case ab: scala.collection.mutable.ArrayBuffer[Row @unchecked] =>
        ab += a
        Row(ab, false)
      case other =>
        Row(scala.collection.mutable.ArrayBuffer.empty[Row] ++= other += a, false)
    }
  }
  override def merge(a: Row, b: Row): Row = {
    if (a.getBoolean(1)) return a
    if (b.getBoolean(1)) return b
    val xs = a.getSeq[Row](0)
    val ys = b.getSeq[Row](0)
    if (xs.length + ys.length > cap) overRow
    else if (ys.isEmpty) a
    else if (xs.isEmpty) b
    else Row(scala.collection.mutable.ArrayBuffer.empty[Row] ++= xs ++= ys, false)
  }
  override def finish(r: Row): Row = r
  override def bufferEncoder: Encoder[Row] = Encoders.row(bufSchema)
  override def outputEncoder: Encoder[Row] = Encoders.row(bufSchema)
}

private[graft] object BoundedCollect {
  /** The udaf column: `collect(cap, schema)(cols...)` → struct with an
    * `items` array (complete iff `over` is false) and the `over` flag.
    */
  def agg(cap: Int, inSchema: StructType): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedCollectAgg(cap, inSchema), Encoders.row(inSchema))
}
