package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for `private[sql]` Spark internals that custom Catalyst
  * expressions need (the standard pattern for Spark extension libraries):
  * Column ↔ Expression conversion (Spark 4 moved it behind
  * `sql.classic.ExpressionUtils`) and the `AbstractDataType` used by
  * `ExpectsInputTypes`.
  */
object GraftSqlBridge {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder under a name in the session registry. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
