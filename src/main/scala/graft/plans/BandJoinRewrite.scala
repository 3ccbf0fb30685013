package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: BAND (interval) joins → bucketed equi-joins.
  *
  * Spark plans an inner join whose only condition is a band predicate —
  * `probe.ts BETWEEN build.lo AND build.hi`, with no equality conjunct —
  * as BroadcastNestedLoopJoin (or a cartesian product), which compares
  * every probe row against every build row: O(n·m), the classic silent
  * scale-killer of event-window analytics. This rule rewrites the
  * logical plan into the standard bucketed shape (the same one
  * `ops.Temporal.rangeJoinCount` builds by hand):
  *
  *   - the probe side gains `bucket = floorDiv(ts, B)`;
  *   - the build side explodes each interval into the buckets it covers
  *     (`explode(sequence(floorDiv(lo, B), floorDiv(hi, B)))`);
  *   - the join becomes `bucket = bucket AND <original band predicate>`
  *     — a hash-partitioned equi-join whose per-row candidate set is
  *     bounded by bucket width, never the whole build side;
  *   - a final Project restores the original output attributes.
  *
  * The rewrite is exactly output-preserving: every original conjunct is
  * kept verbatim (the bucket key only PRE-filters candidate pairs — any
  * pair the band accepts shares a covered bucket), NULL bounds drop rows
  * on both paths (null bucket key / null sequence explodes to nothing,
  * matching the inner join's null-condition drop), and an inverted
  * interval (`lo > hi`) matches nothing on either path.
  *
  * Oversized intervals are bounded, not trusted: an interval spanning
  * ≥ `spark.graft.bandJoin.maxBuckets` buckets (default 4096) would make
  * `sequence()` materialize a huge — at the extreme, array-cap-breaking —
  * bucket array per build row, turning a slow-but-working BNLJ into a
  * runtime failure. Such rows are split off into an OVERFLOW branch: the
  * build side is partitioned by interval width into narrow (bucketed
  * equi-join as above) and wide (a separate join on the original band
  * predicate plus a synthetic always-true cross-side equality
  * `pmod(point,1) = pmod(lo,1)` — it gives Spark a hash key, matches the
  * band predicate's null-drop semantics, and marks the join so this rule
  * never re-rewrites it), and the two branches union. Wide rows are
  * pathological by construction (width ≥ maxBuckets × bucketSize), so the
  * overflow join is a degenerate-key hash join over a tiny build set —
  * and when no row is wide, AQE's empty-relation propagation erases the
  * branch (including its probe scan) at runtime.
  *
  * Activation: set `spark.graft.bandJoin.bucketSize` to a positive long
  * (in the unit of the band columns; e.g. microseconds for epoch-us
  * timestamps, roughly the typical interval width). Unset (the default)
  * the rule is a no-op. It fires only on Inner joins whose condition
  * holds one lower and one upper bound on the SAME integral probe-side
  * expression against build-side bounds, with no equality conjunct
  * (if an equi-key exists, Spark already hash-joins). Guarded against
  * self-re-entry: both rewritten joins carry an equality conjunct, so
  * the shape test fails on them.
  *
  * Install via the library extension
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) or
  * per-session: `spark.experimental.extraOptimizations ++= Seq(BandJoinRewrite(spark))`.
  */
case class BandJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.bandJoin.bucketSize"
  val MaxBucketsKey = "spark.graft.bandJoin.maxBuckets"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bucket =
      try session.conf.get(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    val maxBuckets =
      try math.max(1L, session.conf.get(MaxBucketsKey, "4096").toLong)
      catch { case _: NumberFormatException => 4096L }
    if (bucket <= 0L) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, bucket, maxBuckets).getOrElse(j)
    }
  }

  /** One side's bound on the other side's point expression:
    * `point >= / > / <= / < bound`.
    */
  private case class Bound(point: Expression, bound: Expression, isLower: Boolean)

  private def asBound(e: Expression, pointSide: AttributeSet, boundSide: AttributeSet): Option[Bound] = {
    def classify(a: Expression, b: Expression, aIsLowerOfB: Boolean): Option[Bound] = {
      // a <= b: b is the point → a lower-bounds it; a is the point → b upper-bounds it
      if (b.references.nonEmpty && b.references.subsetOf(pointSide) &&
        a.references.nonEmpty && a.references.subsetOf(boundSide))
        Some(Bound(b, a, isLower = aIsLowerOfB))
      else if (a.references.nonEmpty && a.references.subsetOf(pointSide) &&
        b.references.nonEmpty && b.references.subsetOf(boundSide))
        Some(Bound(a, b, isLower = !aIsLowerOfB))
      else None
    }
    e match {
      case LessThanOrEqual(a, b) => classify(a, b, aIsLowerOfB = true)
      case LessThan(a, b) => classify(a, b, aIsLowerOfB = true)
      case GreaterThanOrEqual(a, b) => classify(b, a, aIsLowerOfB = true)
      case GreaterThan(a, b) => classify(b, a, aIsLowerOfB = true)
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.IntegerType | LongType => true
    case _ => false
  }

  /** floorDiv(x, B) as catalyst nodes, exact on longs for any sign:
    * (x − pmod(x, B)) div B.
    */
  private def floorDiv(x: Expression, b: Long): Expression = {
    val xl = Cast(x, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, Literal(b))), Literal(b))
  }

  private def rewrite(j: Join, bucket: Long, maxBuckets: Long): Option[LogicalPlan] = {
    val cond = j.condition.get
    if (!cond.deterministic) return None
    val conjuncts = splitConjunctivePredicates(cond)
    // an existing equality conjunct between the sides means Spark already
    // has a hash-join key — nothing to fix
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) => crossSides(a, b, j)
      case EqualNullSafe(a, b) => crossSides(a, b, j)
      case _ => false
    }
    if (hasEquiKey) return None

    val leftSet = j.left.outputSet
    val rightSet = j.right.outputSet
    // try probe=left/build=right, then the mirror
    val candidates = Seq((leftSet, rightSet, true), (rightSet, leftSet, false))
    candidates.view.flatMap { case (pointSide, boundSide, probeIsLeft) =>
      val bounds = conjuncts.flatMap(asBound(_, pointSide, boundSide))
      val byPoint = bounds.groupBy(_.point.canonicalized)
      byPoint.values.collectFirst {
        case bs if bs.exists(_.isLower) && bs.exists(!_.isLower) &&
          integral(bs.head.point) && bs.forall(b => integral(b.bound)) =>
          build(j, bucket, maxBuckets, bs.find(_.isLower).get, bs.find(!_.isLower).get, probeIsLeft)
      }
    }.headOption
  }

  private def crossSides(a: Expression, b: Expression, j: Join): Boolean = {
    val l = j.left.outputSet
    val r = j.right.outputSet
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(l) && b.references.subsetOf(r)) ||
        (a.references.subsetOf(r) && b.references.subsetOf(l)))
  }

  private def build(j: Join, bucket: Long, maxBuckets: Long,
      lower: Bound, upper: Bound, probeIsLeft: Boolean): LogicalPlan = {
    val probe = if (probeIsLeft) j.left else j.right
    val buildSide = if (probeIsLeft) j.right else j.left

    val loDiv = floorDiv(lower.bound, bucket)
    val hiDiv = floorDiv(upper.bound, bucket)
    // Partition the build side by interval width in buckets. NULL bounds
    // fail both filters (null predicate → drop), matching the original
    // inner join's null-condition drop; inverted intervals (lo > hi) fail
    // both too (width negative) and match nothing, as they should.
    // Width is computed in DECIMAL(38,0) (ADVICE r5, low): a long
    // subtraction can overflow for extreme bounds with a tiny bucketSize
    // (lo near Long.MinValue/2, hi near Long.MaxValue/2, bucket = 1) —
    // wrapped, the negative width would pass the narrow filter and reach
    // sequence() at runtime (and under ANSI the subtract itself throws).
    // Decimal subtraction of two longs is exact, so width >= 0 whenever
    // lo <= hi and the wide branch correctly absorbs every oversized
    // interval.
    val decWidth = Subtract(
      Cast(hiDiv, org.apache.spark.sql.types.DecimalType(38, 0)),
      Cast(loDiv, org.apache.spark.sql.types.DecimalType(38, 0)))
    val maxB = Cast(Literal(maxBuckets), decWidth.dataType)
    val narrow = Filter(
      And(LessThanOrEqual(loDiv, hiDiv), LessThan(decWidth, maxB)),
      buildSide)
    val wide = Filter(GreaterThanOrEqual(decWidth, maxB), buildSide)

    val bucketAlias = Alias(floorDiv(lower.point, bucket), "__band_bucket_p")()
    val probeProj = Project(probe.output :+ bucketAlias, probe)

    val genOut = AttributeReference("__band_bucket_b", LongType, nullable = false)()
    // sequence(a, b, 1) THROWS when a > b — the narrow filter already
    // excludes inverted/NULL intervals, but keep the guard local so the
    // explode stays safe under any later predicate reordering
    val seq = If(
      LessThanOrEqual(loDiv, hiDiv),
      // timeZoneId must be pinned or the TimeZoneAwareExpression stays
      // unresolved and the optimizer rejects the rewritten plan
      new Sequence(loDiv, hiDiv, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
      Literal.create(
        Array.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
    val buildGen = Generate(
      Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(genOut), child = narrow)

    val newCond = And(EqualTo(bucketAlias.toAttribute, genOut), j.condition.get)
    val newJoin =
      if (probeIsLeft) Join(probeProj, buildGen, Inner, Some(newCond), j.hint)
      else Join(buildGen, probeProj, Inner, Some(newCond), j.hint)
    val bucketed = Project(j.output, newJoin)

    // Overflow branch: the original band predicate over ONLY the wide
    // rows, plus a synthetic always-true cross-side equality on
    // pmod(·, 1). Its roles: (a) ExtractEquiJoinKeys sees a hash key, so
    // the branch plans as a (degenerate-key) hash join, not BNLJ/cartesian
    // over the whole probe; (b) `hasEquiKey` sees it, so this rule never
    // re-rewrites its own overflow join (the fixed-point loop guard);
    // (c) pmod propagates NULL, so a null point/bound drops the row
    // exactly as the band predicate itself would.
    val zeroKeyL = Pmod(Cast(lower.point, LongType), Literal(1L))
    val zeroKeyR = Pmod(Cast(lower.bound, LongType), Literal(1L))
    val overflowCond = And(EqualTo(zeroKeyL, zeroKeyR), j.condition.get)
    val overflowJoin =
      if (probeIsLeft) Join(probe, wide, Inner, Some(overflowCond), j.hint)
      else Join(wide, probe, Inner, Some(overflowCond), j.hint)
    val overflow = Project(j.output, overflowJoin)

    Union(bucketed, overflow)
  }
}
