package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static bridge the generated code calls (a case class' companion gets
  * no static forwarders, so the kernels live in this plain object —
  * same layout as Hashing/Similarity for the other expressions).
  */
object LinkKernels {
  def ctxEmbedding(s: String, dim: Int): Array[Float] =
    graft.link.Linker.contextEmbedding(s, dim)
  def blockingKeysArray(s: String): ArrayData =
    ArrayData.toArrayData(
      graft.link.Linker.blockingKeys(s).map(UTF8String.fromString).toArray)
}

/** Native codegen'd context embedding of a mention surface
  * (`array<float>` of `dim`) — the per-mention kernel of `Linker.link`,
  * formerly a Scala UDF. With this, no data-sized path in the KG
  * pipeline crosses a UDF encoder boundary.
  */
case class CtxEmbedding(child: Expression, dim: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ctx_embedding"
  override def nullSafeEval(s: Any): Any =
    ArrayData.toArrayData(
      LinkKernels.ctxEmbedding(s.asInstanceOf[UTF8String].toString, dim))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.LinkKernels.ctxEmbedding($c.toString(), $dim))")
  override protected def withNewChildInternal(newChild: Expression): CtxEmbedding =
    copy(child = newChild)
}

object CtxEmbedding {
  def ctx_embedding(c: Column, dim: Int): Column =
    GraftSqlBridge.column(CtxEmbedding(GraftSqlBridge.expression(c), dim))
}

/** Native codegen'd blocking keys (`array<string>`, 1-2 keys per
  * surface, `#empty` sentinel for cleaned-to-empty mentions).
  */
case class BlockingKeys(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "blocking_keys"
  override def nullSafeEval(s: Any): Any =
    LinkKernels.blockingKeysArray(s.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LinkKernels.blockingKeysArray($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): BlockingKeys =
    copy(child = newChild)
}

object BlockingKeys {
  def blocking_keys(c: Column): Column =
    GraftSqlBridge.column(BlockingKeys(GraftSqlBridge.expression(c)))
}
