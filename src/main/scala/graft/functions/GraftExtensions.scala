package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer (SURVEY.md §4.2 item 4): wires the
  * engine's native Catalyst expressions into a session at BUILD time —
  * the idiomatic deployment path for an extension library:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * Unlike `Registry.registerAll` / `VecDot.register` (temp-function
  * registration on an EXISTING session), extension-injected functions are
  * part of the session's own registry from creation, survive
  * `spark.newSession()`, and need no driver-side call in user code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[VecDot].getName,
        null,
        "vec_dot",
        "_FUNC_(a, b) - dot product of two array<float> vectors, accumulated in double",
        ""),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(
        classOf[SimHash64].getName,
        null,
        "simhash64",
        "_FUNC_(s) - 64-bit SimHash of a string over whitespace tokens",
        ""),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
  }
}
