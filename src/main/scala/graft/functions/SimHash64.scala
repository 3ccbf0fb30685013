package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a string column — the
  * scan-heavy kernel of `Dedup.simhashPairs` (every document hashes once
  * per dedup pass). Unlike the Scala UDF form, this stays inside
  * whole-stage codegen: no encoder/serializer boundary, no Row boxing —
  * the generated code calls the shared static kernel
  * (`graft.core.Hashing.simhash64`) directly on the decoded string, so
  * the expression and the scalar API cannot drift apart (the kernel is
  * also pinned by the independent golden vectors in KernelGoldenSpec).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(s: Any): Any =
    graft.core.Hashing.simhash64(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Hashing.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column API. */
  def simhash64(c: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(c)))

  /** Register as a SQL function: `SELECT simhash64(text) FROM ...`. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "simhash64", exprs => SimHash64(exprs(0)))
}
