package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct 64-bit hashes of a text's word
  * w-shingles in ONE pass (kernel `graft.core.Hashing.shingleHashes`).
  * Feeds the inverted-index dedup operators (`Dedup.ngramJaccardPairs`):
  * only hash equality matters downstream, so the shingle strings are
  * never materialized as a Spark array — no UDF encoder boundary, no
  * per-shingle UTF8String allocation, and the explode consumes a plain
  * long array. `w` is a plan-time constant baked into generated code.
  */
case class ShingleHashes(child: Expression, w: Int, dedup: Boolean = true)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (dedup) "shingle_hashes" else "shingle_hashes_all"

  override def nullSafeEval(s: Any): Any =
    ArrayData.toArrayData(
      graft.core.Hashing.shingleHashes(s.asInstanceOf[UTF8String].toString, w, dedup))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.core.Hashing.shingleHashes($c.toString(), $w, $dedup))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column API: `shingle_hashes(text, w)` → array<bigint> (distinct;
    * pass `dedup = false` for the ordered multiset).
    */
  def shingle_hashes(c: Column, w: Int, dedup: Boolean = true): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(c), w, dedup))

  /** Register as a SQL function; `w` must be an integer literal. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "shingle_hashes", { exprs =>
      val w = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"shingle_hashes w must be an integer literal, got $other")
      }
      ShingleHashes(exprs(0), w)
    })
}
