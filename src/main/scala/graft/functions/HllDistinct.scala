package graft.functions

import graft.core.{Hashing, Hll}
import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native approximate count-distinct aggregate over the library's
  * deterministic HLL sketch ([[graft.core.Hll]]).
  *
  * Why not `approx_count_distinct`: Spark's HLL++ is also deterministic,
  * but its kernel cannot be replicated outside Spark — this aggregate
  * shares its scalar kernel with the sequential Fixtures replica, so the
  * driver's DuckDB oracle can hard-check the DISTRIBUTED machinery (the
  * map-side partial registers and their per-register-max merge) for
  * bit-identical partition independence.
  *
  * Scale shape: a fixed `2^p`-byte buffer per group (4 KiB at the default
  * p=12, ~1.6% error) flows through the standard partial-aggregation
  * path — the input values themselves never shuffle, which is the entire
  * point versus `count(DISTINCT x)` at 100 TB.
  */
case class HllDistinct(
    child: Expression,
    p: Int = Hll.DefaultP,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = Hll.newRegisters(p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, AggHash.of(v))
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buf, other)
    buf
  }

  override def eval(buf: Array[Byte]): Any = Hll.estimateLong(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"
}

object HllDistinct {
  /** Column API: `df.groupBy(...).agg(hll_distinct(col("x")))`. */
  def hll_distinct(c: Column, p: Int = Hll.DefaultP): Column =
    GraftSqlBridge.column(
      HllDistinct(GraftSqlBridge.expression(c), p).toAggregateExpression())

  /** Register as SQL: `SELECT hll_distinct(x[, p]) FROM ... GROUP BY ...`. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "hll_distinct", {
      case Seq(child)                  => HllDistinct(child).toAggregateExpression()
      case Seq(child, Literal(p, _))   => HllDistinct(child, p.toString.toInt).toAggregateExpression()
      case exprs => throw new IllegalArgumentException(
        s"hll_distinct expects (value[, p]), got ${exprs.size} args")
    })
}
