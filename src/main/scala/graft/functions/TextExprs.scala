package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the scan-heavy text-analysis kernels
  * (`ops.TextAnalysis`), removing the last per-document Scala UDFs from
  * the curation path. Same pattern as SimHash64/MinHashSig: generated
  * code calls the shared static kernel, so the scalar API and the plan
  * operator cannot drift (kernels pinned by KernelGoldenSpec).
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"
  override def nullSafeEval(s: Any): Any =
    graft.ops.TextAnalysis.fingerprint(s.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextAnalysis.fingerprint($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  def fingerprint64(c: Column): Column =
    GraftSqlBridge.column(Fingerprint64(GraftSqlBridge.expression(c)))
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "fingerprint64", exprs => Fingerprint64(exprs(0)))
}

case class LanguageId(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "language_id"
  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      graft.ops.TextAnalysis.languageId(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.ops.TextAnalysis.languageId($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): LanguageId =
    copy(child = newChild)
}

object LanguageId {
  def language_id(c: Column): Column =
    GraftSqlBridge.column(LanguageId(GraftSqlBridge.expression(c)))
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "language_id", exprs => LanguageId(exprs(0)))
}
