package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native expressions for the IVF-ANN path, removing its per-row UDFs:
  * `mix64` (the deterministic sample ordering runs over the WHOLE corpus
  * before the limit) and `nearest_cells` (centroid assignment/probing per
  * corpus/query row). The trained codebook is data-derived, so
  * `NearestCells` carries it as a plan reference object
  * (`ctx.addReferenceObj`) — the standard mechanism for small
  * plan-constant tables in generated code; the codebook is bounded by
  * nCentroids (tiny by construction).
  */
case class Mix64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mix64"
  override def nullSafeEval(v: Any): Any = graft.core.Hashing.mix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Hashing.mix64($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  def mix64(c: Column): Column =
    GraftSqlBridge.column(Mix64(GraftSqlBridge.expression(c)))
}

case class NearestCells(
    child: Expression,
    cents: Array[(Long, Array[Float])],
    nprobe: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"
  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(
      graft.ops.Similarity.nearestCellsKernel(
        v.asInstanceOf[ArrayData].toFloatArray(), cents, nprobe))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCodebook", cents, "java.lang.Object")
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.ops.Similarity.nearestCellsKernel($c.toFloatArray(), $ref, $nprobe))")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def nearest_cells(c: Column, cents: Array[(Long, Array[Float])], nprobe: Int): Column =
    GraftSqlBridge.column(NearestCells(GraftSqlBridge.expression(c), cents, nprobe))
}
