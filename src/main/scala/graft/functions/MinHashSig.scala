package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: k-permutation MinHash signature of a string
  * column — the dominant CPU cost of `Dedup.minhashPairs` (r3 VERDICT:
  * "the one hot-path UDF left where a codegen Expression would remove the
  * encoder boundary"). Mirrors `SimHash64`: the generated code calls the
  * shared static kernel (`graft.core.Hashing.minhashSignature`) directly
  * on the decoded string — no Row boxing, no encoder/serializer crossing,
  * and the expression cannot drift from the scalar API (both pinned by
  * KernelGoldenSpec's independent golden vectors).
  *
  * `k` (signature length) and `w` (shingle width) are plan-time constants
  * baked into the generated code, matching how callers use them.
  */
case class MinHashSig(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(s: Any): Any =
    ArrayData.toArrayData(
      graft.core.Hashing.minhashSignature(s.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.core.Hashing.minhashSignature($c.toString(), $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column API: `minhash_sig(text, k, w)` → array<bigint> of length k. */
  def minhash_sig(c: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c), k, w))

  /** Register as a SQL function: `SELECT minhash_sig(text, 64, 3)` —
    * k and w must be integer literals (they parameterize codegen).
    */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "minhash_sig", { exprs =>
      def lit(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_sig $what must be an integer literal, got $other")
      }
      MinHashSig(exprs(0), lit(exprs(1), "k"), lit(exprs(2), "w"))
    })
}
