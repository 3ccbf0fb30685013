package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** The AS-OF JOIN as a first-class operator: custom logical plan node +
  * planner strategy + physical sorted-merge operator — the full
  * whole-operator extension stack (SURVEY §"custom operators" preference
  * (c): LogicalPlan + SparkStrategy + SparkPlan), complementing the
  * composed-operator formulation in [[graft.ops.Temporal.asOfJoin]]
  * (union-tag + keyed window).
  *
  * Semantics (identical to `Temporal.asOfJoin`, oracle-shared): for each
  * left row, attach the value columns of the LATEST right row with the
  * same key and `right.ts <= left.ts` (inclusive backward as-of); null
  * when no prior right row exists — i.e. an ASOF LEFT JOIN. Right rows
  * sharing (key, ts) must be pre-deduplicated by the caller for a
  * deterministic match (same contract as the window form).
  *
  * NULL semantics match SQL ASOF JOIN (and the DuckDB oracle): NULL
  * never matches. A right row with a null key component or null ts is
  * never a match candidate; a left row with a null key component or
  * null ts gets null value columns. (Without this, natural ascending
  * orderings would sort nulls first and silently pair null with null.)
  *
  * Why a physical operator when the window form already scales: the
  * window shape pays union overhead (right rows widened to the left
  * schema with null payloads), sorts LEFT+RIGHT TOGETHER in one buffer,
  * and runs a running-`last` frame over the union. The merge exec
  * shuffles each side once on the key, sorts each side independently
  * (two smaller spills instead of one combined), and then streams both
  * sorted iterators through a single forward pass — O(1) state (one
  * buffered right row + the current match), no window frame machinery,
  * no schema widening. At 100 TB both sides spill; two narrow sorts of
  * the original schemas beat one sort of the padded union.
  *
  * Plan shape: EnsureRequirements sees the two [[ClusteredDistribution]]
  * requirements and co-partitions both children on the key (hash
  * exchange each side), then the per-child (key, ts) [[SortOrder]]
  * requirements insert in-partition sorts — exactly the SortMergeJoin
  * scaffold, reused for a join type Spark doesn't have. AQE coalesces
  * the two shuffles consistently (the co-partitioning requirement is
  * visible to CoalesceShufflePartitions), so the zipped partitions stay
  * aligned under runtime re-planning.
  *
  * Install: [[AsOfJoin.asof]] auto-registers [[AsOfJoinStrategy]] in the
  * session's `experimental.extraStrategies` (idempotent); extension-built
  * sessions get it from `graft.functions.GraftExtensions`.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Expression],
    valueAttrs: Seq[AttributeReference])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs

  // valueAttrs are PRODUCED here (fresh exprIds, like Generate's
  // generatorOutput) — without this the analyzer counts them as missing
  // inputs and rejects the plan
  override def producedAttributes: AttributeSet = AttributeSet(valueAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Build the as-of join over two DataFrames: `left` keeps all its rows
    * and columns and gains `<v>_asof` for each `v` in `valueCols` — the
    * latest right value at or before the left row's `tsCol` per
    * `keyCols`. Installs [[AsOfJoinStrategy]] into the session if absent.
    *
    * The right side is internally re-projected through fresh aliases, so
    * self-as-of (left and right derived from the same scan — the common
    * events-table case) never produces conflicting attribute ids.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      suffix: String = "_asof"): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    keyCols.foreach { k =>
      require(left.schema(k).dataType == right.schema(k).dataType,
        s"as-of key '$k' type mismatch: ${left.schema(k).dataType} vs ${right.schema(k).dataType}")
    }
    require(left.schema(tsCol).dataType == right.schema(tsCol).dataType,
      s"as-of ts '$tsCol' type mismatch")

    // fresh exprIds for every right-side attribute (Alias allocates new
    // ids), so a self-join shares no ids across the two children
    val rCols = (keyCols :+ tsCol) ++ valueCols.filterNot(v => keyCols.contains(v) || v == tsCol)
    val rProj = right.select(rCols.map(n => col(n).as(s"__asof_$n")): _*)
    val lp = GraftSqlBridge.analyzed(left)
    val rp = GraftSqlBridge.analyzed(rProj)
    def lAttr(n: String): Attribute = lp.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"left column '$n' not found"))
    def rAttr(n: String): Attribute = rp.output.find(_.name == s"__asof_$n")
      .getOrElse(throw new IllegalArgumentException(s"right column '$n' not found"))

    val node = AsOfJoin(
      lp, rp,
      keyCols.map(lAttr), keyCols.map(rAttr),
      lAttr(tsCol), rAttr(tsCol),
      valueCols.map(rAttr),
      valueCols.map(v => AttributeReference(
        v + suffix, right.schema(v).dataType, nullable = true)()))
    GraftSqlBridge.ofRows(spark, node)
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]. Stateless — safe to install
  * once per session.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, rv, va) =>
      AsOfJoinExec(lk, rk, lts, rts, rv, va, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join. Children arrive co-hash-partitioned
  * on the keys and sorted by (keys, ts) — declared via
  * `requiredChildDistribution` / `requiredChildOrdering`, materialized by
  * EnsureRequirements — so each partition pair merges in ONE forward
  * pass: per left row, consume right rows up to (key, ts), remembering
  * only the last one with an equal key. O(1) operator state; each right
  * row is copied at most once (sort iterators reuse row buffers).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Expression],
    valueAttrs: Seq[AttributeReference],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs

  override def producedAttributes: AttributeSet = AttributeSet(valueAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // left rows pass through in order, one output row each
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTs
    val rt = rightTs
    val vals = rightVals
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val out = output
    val nVals = valueAttrs.length

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lk, lOut)
        val rKeyProj = UnsafeProjection.create(rk, rOut)
        val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
        val rTsProj = UnsafeProjection.create(Seq(rt), rOut)
        val valProj = UnsafeProjection.create(vals, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
        val resultProj = UnsafeProjection.create(out, out)
        val joined = new JoinedRow
        val nullVals = InternalRow.fromSeq(Seq.fill[Any](nVals)(null))

        var pending: InternalRow = null // next unconsumed right row (copied)
        var matchRow: InternalRow = null // last right row consumed with some key

        lIter.map { l =>
          val lKey = lKeyProj(l)
          val lTsRow = lTsProj(l)
          val rv = if (lKey.anyNull || lTsRow.isNullAt(0)) {
            // SQL ASOF: a null key component or null ts never matches.
            // Null-key/ts left rows sort first, so skipping the merge
            // here cannot desynchronize the forward pass.
            nullVals
          } else {
            var done = false
            while (!done) {
              if (pending == null && rIter.hasNext) pending = rIter.next().copy()
              if (pending == null) done = true
              else {
                val pKey = rKeyProj(pending)
                if (pKey.anyNull || rTsProj(pending).isNullAt(0)) {
                  // null key/ts right rows are never match candidates;
                  // they sort first, so dropping them preserves order
                  pending = null
                } else {
                  val c = keyOrd.compare(pKey, lKey)
                  if (c < 0) {
                    // right key strictly before every remaining left
                    // row's: its matches are behind us — drop it
                    pending = null
                  } else if (c == 0 && tsOrd.compare(rTsProj(pending), lTsRow) <= 0) {
                    matchRow = pending // later rows at the same key overwrite
                    pending = null
                  } else done = true
                }
              }
            }
            // matchRow may be from a previous key — re-check key equality
            if (matchRow != null && keyOrd.compare(rKeyProj(matchRow), lKey) == 0)
              valProj(matchRow)
            else nullVals
          }
          resultProj(joined(l, rv))
        }
    }
  }
}
