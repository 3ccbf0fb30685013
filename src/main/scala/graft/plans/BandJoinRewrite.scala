package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
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
  * Activation: set `spark.graft.bandJoin.bucketSize` to a positive long
  * (in the unit of the band columns; e.g. microseconds for epoch-us
  * timestamps, roughly the typical interval width). Unset (the default)
  * the rule is a no-op. It fires only on Inner joins whose condition
  * holds one lower and one upper bound on the SAME integral probe-side
  * expression against build-side bounds, with no equality conjunct
  * (if an equi-key exists, Spark already hash-joins). Guarded against
  * self-re-entry: the rewritten join carries an equality conjunct, so
  * the shape test fails on it.
  *
  * Install via the library extension
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) or
  * per-session: `spark.experimental.extraOptimizations ++= Seq(BandJoinRewrite(spark))`.
  */
case class BandJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.bandJoin.bucketSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bucket =
      try session.conf.get(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (bucket <= 0L) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, bucket).getOrElse(j)
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

  private def rewrite(j: Join, bucket: Long): Option[LogicalPlan] = {
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
          build(j, bucket, bs.find(_.isLower).get, bs.find(!_.isLower).get, probeIsLeft)
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

  private def build(j: Join, bucket: Long, lower: Bound, upper: Bound, probeIsLeft: Boolean): LogicalPlan = {
    val probe = if (probeIsLeft) j.left else j.right
    val buildSide = if (probeIsLeft) j.right else j.left

    val bucketAlias = Alias(floorDiv(lower.point, bucket), "__band_bucket_p")()
    val probeProj = Project(probe.output :+ bucketAlias, probe)

    val genOut = AttributeReference("__band_bucket_b", LongType, nullable = false)()
    // sequence(a, b, 1) THROWS when a > b — an inverted interval
    // (lo > hi) must instead explode to nothing, like the inner join it
    // replaces; a NULL bound also routes here (If's null-predicate →
    // else branch), matching the original join's null-condition drop
    val loDiv = floorDiv(lower.bound, bucket)
    val hiDiv = floorDiv(upper.bound, bucket)
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
      qualifier = None, generatorOutput = Seq(genOut), child = buildSide)

    val newCond = And(EqualTo(bucketAlias.toAttribute, genOut), j.condition.get)
    val newJoin =
      if (probeIsLeft) Join(probeProj, buildGen, Inner, Some(newCond), j.hint)
      else Join(buildGen, probeProj, Inner, Some(newCond), j.hint)
    Project(j.output, newJoin)
  }
}
