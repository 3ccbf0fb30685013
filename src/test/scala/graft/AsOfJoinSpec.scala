package graft

import graft.plans.{AsOfJoin, AsOfJoinExec, AsOfJoinStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of join operator (logical node + strategy + sorted-merge
  * physical exec): semantics identical to `Temporal.asOfJoin` (the
  * union+window formulation), plan shape = two key exchanges + two
  * in-partition sorts + the merge exec — no Window, no union.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  import scala.util.Random

  private def randomSides(seed: Int, nLeft: Int, nRight: Int, nKeys: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new Random(seed)
    val left = (0 until nLeft).map { i =>
      (s"e$i", s"u${rnd.nextInt(nKeys)}", rnd.nextInt(1000).toLong)
    }.toDF("event_id", "user_id", "ts_us")
    // distinct (key, ts) on the right — the deterministic-match contract
    val right = (0 until nRight).map { i =>
      (s"u${rnd.nextInt(nKeys)}", rnd.nextInt(1000).toLong, rnd.nextDouble())
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("user_id", "ts_us", "pvalue")
    (left, right)
  }

  /** Sequential reference: latest right (ts <= left ts) per key. */
  private def reference(left: DataFrame, right: DataFrame): Seq[(String, Option[Double])] = {
    val rs = right.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    left.collect().map { l =>
      val (id, k, ts) = (l.getString(0), l.getString(1), l.getLong(2))
      val best = rs.filter(r => r._1 == k && r._2 <= ts).sortBy(_._2).lastOption
      (id, best.map(_._3))
    }.toSeq.sortBy(_._1)
  }

  private def collectAsOf(df: DataFrame): Seq[(String, Option[Double])] =
    df.select("event_id", "pvalue_asof").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq.sortBy(_._1)

  test("merge as-of join matches the sequential reference and the window formulation") {
    val (l, r) = randomSides(seed = 11, nLeft = 300, nRight = 200, nKeys = 12)
    val ref = reference(l, r)
    val merge = AsOfJoin.asof(l, r, Seq("user_id"), "ts_us", Seq("pvalue"))
    assert(collectAsOf(merge) == ref)
    val window = graft.ops.Temporal.asOfJoin(l, r, "user_id", "ts_us", "pvalue")
    assert(collectAsOf(window) == ref)
  }

  test("rows with no prior right row get null; empty right side is all-null") {
    import spark.implicits._
    val l = Seq(("e1", "a", 10L), ("e2", "b", 10L)).toDF("event_id", "user_id", "ts_us")
    val r = Seq(("a", 20L, 1.0)).toDF("user_id", "ts_us", "pvalue")
    assert(collectAsOf(AsOfJoin.asof(l, r, Seq("user_id"), "ts_us", Seq("pvalue"))) ==
      Seq(("e1", None), ("e2", None)))
    val empty = r.filter(lit(false))
    assert(collectAsOf(AsOfJoin.asof(l, empty, Seq("user_id"), "ts_us", Seq("pvalue"))) ==
      Seq(("e1", None), ("e2", None)))
  }

  test("inclusive backward semantics: an equal-ts right row matches") {
    import spark.implicits._
    val l = Seq(("e1", "a", 10L)).toDF("event_id", "user_id", "ts_us")
    val r = Seq(("a", 10L, 7.5), ("a", 5L, 1.0)).toDF("user_id", "ts_us", "pvalue")
    assert(collectAsOf(AsOfJoin.asof(l, r, Seq("user_id"), "ts_us", Seq("pvalue"))) ==
      Seq(("e1", Some(7.5))))
  }

  test("SQL ASOF null semantics: null key/ts never matches on either side") {
    import spark.implicits._
    val l = Seq(
      ("e1", Some("a"), Some(10L)), // normal: matches a@5
      ("e2", None, Some(10L)),      // null key → null values, NOT the null-key right row
      ("e3", Some("a"), None),      // null ts → null values
      ("e4", Some("b"), Some(10L))  // its only candidate has null ts → null values
    ).toDF("event_id", "user_id", "ts_us")
    val r = Seq(
      (Some("a"), Some(5L), 1.5),
      (None: Option[String], Some(3L), 99.0), // null key: never a candidate
      (Some("b"), None: Option[Long], 42.0)   // null ts: never a candidate
    ).toDF("user_id", "ts_us", "pvalue")
    assert(collectAsOf(AsOfJoin.asof(l, r, Seq("user_id"), "ts_us", Seq("pvalue"))) ==
      Seq(("e1", Some(1.5)), ("e2", None), ("e3", None), ("e4", None)))
  }

  test("self-as-of (both sides from one scan) resolves without attribute collisions") {
    import spark.implicits._
    val e = Seq(
      ("e1", "view", "a", 10L, 0.0), ("e2", "buy", "a", 5L, 3.25),
      ("e3", "view", "a", 4L, 0.0), ("e4", "buy", "b", 50L, 9.0),
      ("e5", "view", "b", 60L, 0.0)).toDF("event_id", "event_type", "user_id", "ts_us", "value")
    val views = e.filter($"event_type" === "view").select("event_id", "user_id", "ts_us")
    val buys = e.filter($"event_type" === "buy")
      .select($"user_id", $"ts_us", $"value".as("pvalue"))
    val got = collectAsOf(AsOfJoin.asof(views, buys, Seq("user_id"), "ts_us", Seq("pvalue")))
    assert(got == Seq(("e1", Some(3.25)), ("e3", None), ("e5", Some(9.0))))
  }

  test("multi-column keys and multiple value columns") {
    import spark.implicits._
    val l = Seq(("e1", "a", "x", 10L), ("e2", "a", "y", 10L))
      .toDF("event_id", "k1", "k2", "ts_us")
    val r = Seq(("a", "x", 5L, 1.5, "m1"), ("a", "y", 20L, 2.5, "m2"))
      .toDF("k1", "k2", "ts_us", "v", "tag")
    val got = AsOfJoin.asof(l, r, Seq("k1", "k2"), "ts_us", Seq("v", "tag"))
      .select("event_id", "v_asof", "tag_asof").collect()
      .map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSeq.sortBy(_._1)
    assert(got == Seq(("e1", Some(1.5), Some("m1")), ("e2", None, None)))
  }

  test("plan: AsOfJoinExec with two key exchanges and in-partition sorts; no Window, no union") {
    val (l, r) = randomSides(seed = 5, nLeft = 50, nRight = 50, nKeys = 4)
    val df = AsOfJoin.asof(l, r, Seq("user_id"), "ts_us", Seq("pvalue"))
    df.collect() // materialize through AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert(!p.contains("Window") && !p.contains("Union"), s"fallback shape leaked:\n$p")
    assert("hashpartitioning".r.findAllIn(p).size >= 2, s"expected two key exchanges:\n$p")
    assert(p.contains("Sort "), s"in-partition sorts missing:\n$p")
  }

  test("survives skewed keys and many partitions (AQE coalesce keeps sides aligned)") {
    import spark.implicits._
    val l = (0 until 2000).map(i => (s"e$i", if (i % 10 == 0) s"u${i % 7}" else "hot", i.toLong))
      .toDF("event_id", "user_id", "ts_us").repartition(13)
    val r = (0 until 500).map(i => (if (i % 3 == 0) "hot" else s"u${i % 7}", i.toLong * 4, i.toDouble))
      .toDF("user_id", "ts_us", "pvalue").repartition(7)
    val got = collectAsOf(AsOfJoin.asof(l, r, Seq("user_id"), "ts_us", Seq("pvalue")))
    val ref = reference(l, r)
    assert(got == ref)
  }

  test("GraftExtensions injects the as-of strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.GraftExtensionsProbe.plannerStrategies(ext, spark)
    assert(strategies.contains(AsOfJoinStrategy))
  }
}
