package graft.functions

import graft.core.{Bloom, CountMin, DdHist, Hashing, Sketch}
import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native aggregates + probe expressions for the deterministic mergeable
  * sketches in [[graft.core.Sketch]] (Bloom membership, Count-Min
  * frequency, DDSketch-style log-bucket quantiles), completing the
  * sketch quartet begun by [[HllDistinct]].
  *
  * Shape contract shared by all three: a fixed-size long-register block
  * per group flows through the standard partial-aggregation path (the
  * values themselves never shuffle), merges with an associative +
  * commutative op, and serializes little-endian — so the distributed
  * result is bit-identical to the sequential Fixtures replica under any
  * partitioning, which is exactly what the driver's DuckDB oracle checks.
  */
private[functions] object AggHash {
  /** Canonical value→hash used by every sketch aggregate (and by the
    * [[HllDistinct]] aggregate), so a probe expression hashing the same
    * value always lands on the same registers.
    */
  def of(v: Any): Long = v match {
    case s: UTF8String => Hashing.hashString(s.toString)
    case l: Long       => Hashing.mix64(l)
    case i: Int        => Hashing.mix64(i.toLong)
    case other         => Hashing.hashString(other.toString)
  }
}

/** `hash64(s)` — the library's deterministic 64-bit string hash as a
  * codegen'd scalar, for probe-side key hashing against sketches built
  * over string columns (same value→hash as the aggregates' [[AggHash]]).
  */
case class Hash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash64"
  override def nullSafeEval(s: Any): Any =
    Hashing.hashString(s.asInstanceOf[UTF8String].toString, 0L)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Hashing.hashString($c.toString(), 0L)")
  override protected def withNewChildInternal(newChild: Expression): Hash64 =
    copy(child = newChild)
}

object Hash64 {
  def hash64(c: Column): Column =
    GraftSqlBridge.column(Hash64(GraftSqlBridge.expression(c)))
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "hash64", exprs => Hash64(exprs(0)))
}

/** `bloom_build(x, mBits, k)` → binary: a Bloom filter over the column's
  * values (strings hash via [[AggHash]]; longs are treated as pre-hashed
  * only if you hashed them — a raw long is mixed, matching probes that
  * mix the same long). Merge is bitwise OR. The serialized form is
  * self-describing (k in the header word) and probes via
  * [[BloomMightContain]].
  */
case class BloomBuild(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Bloom.create(mBits, k)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, AggHash.of(v))
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    Bloom.merge(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = Bloom.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Sketch.longsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Sketch.bytesToLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"
}

object BloomBuild {
  def bloom_build(c: Column, mBits: Int, k: Int): Column =
    GraftSqlBridge.column(
      BloomBuild(GraftSqlBridge.expression(c), mBits, k).toAggregateExpression())
}

/** `bloom_might_contain(bloom, hash)` — membership probe; false means
  * DEFINITELY absent (the guarantee join pruning relies on), true means
  * possibly present. Per-thread deserialization memo makes the literal/
  * broadcast-sketch case unpack once per task.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  override def nullSafeEval(bloom: Any, h: Any): Any =
    Bloom.mightContainCached(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.core.Bloom.mightContainCached($b, $h)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  def bloom_might_contain(bloom: Column, hash: Column): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(hash)))
}

/** `cms_build(x, d, w)` → binary: Count-Min frequency sketch (d rows × w
  * counters; estimates are over-counts within eps·N). Merge is
  * elementwise add, so partial aggregation is exact.
  */
case class CmsBuild(
    child: Expression,
    depth: Int = CountMin.DefaultDepth,
    width: Int = CountMin.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = CountMin.create(depth, width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.add(buf, AggHash.of(v))
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CountMin.merge(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = CountMin.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Sketch.longsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Sketch.bytesToLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsBuild =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_build"
}

object CmsBuild {
  def cms_build(
      c: Column,
      depth: Int = CountMin.DefaultDepth,
      width: Int = CountMin.DefaultWidth): Column =
    GraftSqlBridge.column(
      CmsBuild(GraftSqlBridge.expression(c), depth, width).toAggregateExpression())
}

/** `cms_estimate(cms, hash)` — frequency estimate for a key (min over
  * rows; never an under-count).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"
  override def nullSafeEval(cms: Any, h: Any): Any =
    CountMin.estimateCached(cms.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, h) => s"graft.core.CountMin.estimateCached($c, $h)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def cms_estimate(cms: Column, hash: Column): Column =
    GraftSqlBridge.column(CmsEstimate(
      GraftSqlBridge.expression(cms), GraftSqlBridge.expression(hash)))
}

/** `dd_quantiles(x, qs[, alpha])` → array<double>: DDSketch-style
  * log-bucket quantile estimates over a non-negative long column, each
  * within relative error `alpha` of the true quantile. The histogram has
  * fixed (non-collapsing) buckets, so merge is elementwise add and the
  * estimates are partition-independent — unlike rank-based sketches
  * (GK/KLL) whose state depends on insertion order.
  */
case class DdQuantiles(
    child: Expression,
    quantiles: Seq[Double],
    alpha: Double = DdHist.DefaultAlpha,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be within [0,1], got $quantiles")
  require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")

  override def createAggregationBuffer(): Array[Long] = DdHist.create(alpha)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v match {
        case l: Long => l
        case i: Int  => i.toLong
        case other   => other.toString.toLong
      }
      DdHist.add(buf, alpha, l)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    DdHist.merge(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(
      quantiles.map(q => DdHist.quantile(buf, alpha, q)).toArray)

  override def serialize(buf: Array[Long]): Array[Byte] = Sketch.longsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Sketch.bytesToLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DdQuantiles =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "dd_quantiles"
}

object DdQuantiles {
  def dd_quantiles(c: Column, qs: Seq[Double], alpha: Double = DdHist.DefaultAlpha): Column =
    GraftSqlBridge.column(
      DdQuantiles(GraftSqlBridge.expression(c), qs, alpha).toAggregateExpression())
}

/** SQL registration for the sketch surface (mirrored in
  * [[GraftExtensions]] for extension-injected sessions).
  */
object SketchFunctions {

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an integer literal, got $other")
  }

  /** Any foldable numeric → double (SQL fractional literals like `0.5`
    * arrive as Decimal, not Double).
    */
  private def toDouble(v: Any, fn: String, what: String): Double = v match {
    case d: Double                              => d
    case f: Float                               => f.toDouble
    case d: org.apache.spark.sql.types.Decimal  => d.toDouble
    case l: Long                                => l.toDouble
    case i: Int                                 => i.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn $what must be numeric, got $other")
  }

  /** Parse `array(0.25, 0.5, ...)` / foldable array expression args. */
  private[functions] def quantileList(e: Expression): Seq[Double] = {
    require(e.foldable, s"dd_quantiles qs must be a foldable array literal, got $e")
    (e.eval(), e.dataType) match {
      case (a: ArrayData, ArrayType(et, _)) =>
        (0 until a.numElements()).map(i => toDouble(a.get(i, et), "dd_quantiles", "qs element"))
      case (other, _) => throw new IllegalArgumentException(
        s"dd_quantiles qs must evaluate to a numeric array, got $other")
    }
  }

  private[functions] def bloomFromExprs(exprs: Seq[Expression]): Expression =
    BloomBuild(exprs(0),
      intLit(exprs(1), "bloom_build", "mBits"),
      intLit(exprs(2), "bloom_build", "k")).toAggregateExpression()

  private[functions] def cmsFromExprs(exprs: Seq[Expression]): Expression = (exprs match {
    case Seq(child)       => CmsBuild(child)
    case Seq(child, d, w) => CmsBuild(child,
      intLit(d, "cms_build", "depth"), intLit(w, "cms_build", "width"))
    case other => throw new IllegalArgumentException(
      s"cms_build expects (value[, depth, width]), got ${other.size} args")
  }).toAggregateExpression()

  private[functions] def ddFromExprs(exprs: Seq[Expression]): Expression = (exprs match {
    case Seq(child, qs) => DdQuantiles(child, quantileList(qs))
    case Seq(child, qs, Literal(a, _)) =>
      DdQuantiles(child, quantileList(qs), toDouble(a, "dd_quantiles", "alpha"))
    case other => throw new IllegalArgumentException(
      s"dd_quantiles expects (value, qs array[, alpha literal]), got ${other.size} args")
  }).toAggregateExpression()

  def register(spark: SparkSession): Unit = {
    Hash64.register(spark)
    GraftSqlBridge.registerFunction(spark, "bloom_build", bloomFromExprs)
    GraftSqlBridge.registerFunction(spark, "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)))
    GraftSqlBridge.registerFunction(spark, "cms_build", cmsFromExprs)
    GraftSqlBridge.registerFunction(spark, "cms_estimate",
      exprs => CmsEstimate(exprs(0), exprs(1)))
    GraftSqlBridge.registerFunction(spark, "dd_quantiles", ddFromExprs)
  }
}
