package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: banded random-hyperplane sign-bit keys of
  * an embedding (`array<float>` → `array<bigint>`, one key per band) —
  * the scan-heavy bucketing kernel of `Similarity.lshTopK` and
  * `Dedup.embeddingNearDupPairs`, formerly a Scala UDF per corpus row.
  * The plane vectors derive deterministically from (seed, planes, dim)
  * and are memoized per executor JVM (`Similarity.signBandsKernel`), so
  * the expression carries only plan-time constants: no closure capture,
  * no broadcast, and codegen calls the shared static kernel the fixture
  * oracles also use.
  */
case class SignBands(child: Expression, seed: Long, planes: Int, dim: Int, bands: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_bands"

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(
      graft.ops.Similarity.signBandsKernel(
        v.asInstanceOf[ArrayData].toFloatArray(), seed, planes, dim, bands))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.ops.Similarity.signBandsKernel($c.toFloatArray(), ${seed}L, $planes, $dim, $bands))")

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  /** Column API. */
  def sign_bands(c: Column, seed: Long, planes: Int, dim: Int, bands: Int): Column =
    GraftSqlBridge.column(SignBands(GraftSqlBridge.expression(c), seed, planes, dim, bands))
}
