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

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point a
    * custom LogicalPlan operator needs (`Dataset.ofRows` is
    * `private[sql]`).
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for building custom
    * operator nodes over existing frames).
    */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The session's Hadoop configuration wrapped for task-side shipping
    * (`SerializableConfiguration` is `private[spark]`); pair with
    * [[unwrapHadoopConf]] on the executor. Falls back to defaults when no
    * session is active (e.g. driver-side unit construction).
    */
  def serializableHadoopConf(): java.io.Serializable =
    new org.apache.spark.util.SerializableConfiguration(
      SparkSession.getActiveSession.map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration()))

  def unwrapHadoopConf(c: java.io.Serializable): org.apache.hadoop.conf.Configuration =
    c.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value

  /** The active session's Hadoop configuration (driver side). */
  def activeHadoopConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Neutral view of a predicate Column's node tree for metadata-level
    * evaluation (zone-map pruning): function applications, attribute
    * references, literals; anything else collapses to [[PredTree.Opaque]].
    * `ColumnNode` itself is `private[sql]`, hence this bridge.
    */
  sealed trait PredTree
  object PredTree {
    case class Fn(name: String, args: Seq[PredTree]) extends PredTree
    case class Attr(name: String) extends PredTree
    case class Lit(value: Any) extends PredTree
    case object Opaque extends PredTree
  }

  def predicateTree(c: Column): PredTree = {
    import org.apache.spark.sql.internal._
    def conv(n: ColumnNode): PredTree = n match {
      case f: UnresolvedFunction => PredTree.Fn(f.functionName, f.arguments.map(conv))
      case a: UnresolvedAttribute =>
        a.nameParts.lastOption.map(PredTree.Attr).getOrElse(PredTree.Opaque)
      case l: Literal => PredTree.Lit(l.value)
      case _ => PredTree.Opaque
    }
    conv(c.node)
  }

  /** Register a function builder under a name in the session registry. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
