package graft

import graft.plans.BandJoinRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The band-join optimizer rule: a pure interval predicate join (no equi
  * key → Spark plans BroadcastNestedLoopJoin) is rewritten into the
  * bucketed equi-join, output-identical to the unrewritten plan.
  */
class BandJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private val ConfKey = "spark.graft.bandJoin.bucketSize"

  private def withRule[A](bucket: Long)(f: => A): A = {
    val rule = BandJoinRewrite(spark)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ rule
    spark.conf.set(ConfKey, bucket.toString)
    try f
    finally {
      spark.conf.unset(ConfKey)
      spark.experimental.extraOptimizations = before
    }
  }

  private def events: DataFrame = {
    import spark.implicits._
    // ts deliberately spans negative values: floorDiv must floor, not
    // truncate toward zero, or bucket −1 rows land in bucket 0
    (-50L to 300L by 7L).map(ts => (s"e$ts", ts)).toDF("event_id", "ts")
  }

  private def windows: DataFrame = {
    import spark.implicits._
    Seq(
      ("w1", -40L, 10L), ("w2", 0L, 99L), ("w3", 95L, 105L),
      ("w4", 200L, 180L), // inverted: matches nothing
      ("w5", 290L, 310L)).toDF("win_id", "lo", "hi")
  }

  private def bandJoin(e: DataFrame, w: DataFrame): DataFrame =
    e.join(w, e("ts") >= w("lo") && e("ts") <= w("hi"))
      .groupBy("win_id").agg(count(lit(1)).as("n"))

  test("rewritten band join is output-identical and plans as a hash equi-join, not BNLJ") {
    val baseline = bandJoin(events, windows).collect().map(r => (r.getString(0), r.getLong(1))).sorted
    withRule(bucket = 16L) {
      val df = bandJoin(events, windows)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
        s"band join not rewritten:\n$phys")
      assert(df.queryExecution.optimizedPlan.toString.contains("explode"),
        "bucket explode missing from the rewritten plan")
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(got.toSeq == baseline.toSeq)
    }
  }

  test("mirrored orientation (point on the right side) also rewrites") {
    val e = events
    val w = windows
    def q = w.join(e, e("ts") > w("lo") && e("ts") < w("hi"))
    val baseline = q.count()
    withRule(bucket = 8L) {
      val df = q
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"))
      assert(df.count() == baseline)
    }
  }

  test("null bounds and null points drop rows on both paths") {
    import spark.implicits._
    val e = Seq(("a", Some(5L)), ("b", None)).toDF("event_id", "ts")
    val w = Seq(("w1", Some(0L), Some(10L)), ("w2", None, Some(10L)), ("w3", Some(0L), None))
      .toDF("win_id", "lo", "hi")
    def q = e.join(w, e("ts") >= w("lo") && e("ts") <= w("hi"))
      .select("event_id", "win_id")
    val baseline = q.collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(baseline.toSeq == Seq(("a", "w1")))
    withRule(bucket = 4L) {
      assert(q.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq == baseline.toSeq)
    }
  }

  test("joins with an equi key are left alone; conf unset leaves the rule a no-op") {
    import spark.implicits._
    val e = Seq(("k1", 5L), ("k2", 50L)).toDF("k", "ts")
    val w = Seq(("k1", 0L, 10L), ("k2", 60L, 70L)).toDF("k", "lo", "hi")
    withRule(bucket = 8L) {
      val df = e.as("e").join(w.as("w"),
        col("e.k") === col("w.k") && col("e.ts") >= col("w.lo") && col("e.ts") <= col("w.hi"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("__band_bucket"),
        "equi-keyed join must not be bucketed")
      assert(df.count() == 1L)
    }
    // rule installed but conf unset: plan untouched (BNLJ as Spark would)
    val rule = BandJoinRewrite(spark)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ rule
    try {
      val df = bandJoin(events, windows)
      assert(!df.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
    } finally spark.experimental.extraOptimizations = before
  }

  test("extra non-band conjuncts survive the rewrite verbatim") {
    import spark.implicits._
    val e = Seq(("a", 5L, 1), ("b", 6L, 2), ("c", 7L, 1)).toDF("event_id", "ts", "sev")
    val w = Seq(("w1", 0L, 10L, 1), ("w2", 0L, 10L, 2)).toDF("win_id", "lo", "hi", "min_sev")
    def q = e.join(w,
      e("ts") >= w("lo") && e("ts") <= w("hi") && e("sev") >= w("min_sev"))
      .select("event_id", "win_id")
    val baseline = q.collect().map(r => (r.getString(0), r.getString(1))).sorted
    withRule(bucket = 4L) {
      val got = q.collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(got.toSeq == baseline.toSeq)
      assert(q.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
    }
  }

  test("intervals wider than maxBuckets take the overflow branch instead of exploding") {
    import spark.implicits._
    val e = (0L to 1000L by 13L).map(ts => (s"e$ts", ts)).toDF("event_id", "ts")
    // w_huge spans 1000 buckets at bucket=1 — over the maxBuckets cap:
    // without the overflow branch the explode would materialize a
    // 1000-element array per copy of this row (and at real widths would
    // hit sequence()'s array cap and FAIL a working query at runtime)
    val w = Seq(("w_narrow", 100L, 120L), ("w_huge", 0L, 1000L), ("w_inv", 50L, 10L))
      .toDF("win_id", "lo", "hi")
    def q = e.join(w, e("ts") >= w("lo") && e("ts") <= w("hi"))
      .groupBy("win_id").agg(count(lit(1)).as("n"))
    val baseline = q.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    spark.conf.set("spark.graft.bandJoin.maxBuckets", "64")
    try withRule(bucket = 1L) {
      val df = q
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("Union"), s"overflow branch missing:\n$opt")
      assert(opt.contains("__band_bucket"), s"bucketed branch missing:\n$opt")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
        s"overflow branch degenerated to a nested-loop join:\n$phys")
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(got.toSeq == baseline.toSeq)
    } finally spark.conf.unset("spark.graft.bandJoin.maxBuckets")
  }

  test("GraftExtensions injects the rule into a session's optimizer rules") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.GraftExtensionsProbe.optimizerRules(ext, spark)
    assert(rules.exists(_.isInstanceOf[BandJoinRewrite]))
  }
}
