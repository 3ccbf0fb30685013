package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (UDTF surface, SURVEY §2.10): LLM
  * context-window chunking as a custom Catalyst [[Generator]] — the
  * `explode`-class extension point, usable from SQL as
  * `LATERAL VIEW graft_chunk(text, width, stride)`. Emits one row per
  * window of `width` whitespace tokens at the given `stride`
  * (chunk_ix, tok_start, n_tok, chunk_text); blank/null text generates
  * nothing. Semantics are identical to the relational formulation in
  * `SparkEntry.q_docs_chunk` (split + explode(sequence) + slice), which
  * the shared DuckDB oracle checks for BOTH paths — the generator is the
  * API-surface variant; the relational plan stays the preferred shape
  * (whole-stage codegen; this generator is a [[CodegenFallback]], the
  * standard cost of the Generator extension point).
  */
case class ChunkText(child: Expression, width: Int, stride: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback
    with ExpectsInputTypes {

  require(width > 0, "width must be positive")
  require(stride > 0, "stride must be positive")

  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(StringType)
  override def prettyName: String = "graft_chunk"

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_ix", LongType, nullable = false),
    StructField("tok_start", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      // Spark-faithful tokenization, NOT java.lang.String defaults: the
      // relational formulation (and the shared DuckDB oracle) computes
      // split(trim(text), '\s+') where Spark's trim strips SPACES only
      // (String.trim would also strip tabs/newlines) and Spark's split
      // uses limit -1 (String.split(re) drops trailing empty tokens).
      // Matching both keeps the two paths identical on hostile inputs
      // (leading/trailing control whitespace), not just on clean corpora.
      val txt = ChunkText.spaceTrim(v.asInstanceOf[UTF8String].toString)
      if (txt.isEmpty) Iterator.empty
      else {
        val toks = ChunkText.Whitespace.split(txt, -1)
        Iterator.range(0, toks.length, stride).map { ts =>
          val n = math.min(width, toks.length - ts)
          InternalRow(
            (ts / stride).toLong,
            ts.toLong,
            n.toLong,
            UTF8String.fromString(toks.slice(ts, ts + n).mkString(" ")))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
}

object ChunkText {

  private[functions] val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Spark `trim` semantics: strip leading/trailing SPACE (0x20) only. */
  private[functions] def spaceTrim(s: String): String = {
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    s.substring(from, until)
  }

  /** Column API (pair with `select(..., explode-style)` via Dataset SQL;
    * generators are consumed by LATERAL VIEW / SELECT-list generation).
    */
  def graft_chunk(c: Column, width: Int, stride: Int): Column =
    GraftSqlBridge.column(ChunkText(GraftSqlBridge.expression(c), width, stride))

  private[functions] def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"graft_chunk $what must be an integer literal, got $other")
  }

  /** The single function builder shared by the session Registry and the
    * extension injection — one place owns the argument contract.
    */
  def build(exprs: Seq[Expression]): ChunkText = {
    require(exprs.length == 3,
      s"graft_chunk takes (text, width, stride), got ${exprs.length} args")
    ChunkText(exprs(0), litInt(exprs(1), "width"), litInt(exprs(2), "stride"))
  }

  /** Register as a SQL table-generating function; `width` and `stride`
    * must be integer literals (plan-time constants baked into the
    * generator).
    */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "graft_chunk", build)
}
