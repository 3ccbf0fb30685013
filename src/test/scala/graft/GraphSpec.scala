package graft

import graft.graph.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** Graph analytics over the constructed KG: degrees (oracle-checked at
  * the driver via kg_degree) and PageRank (compared here against a local
  * dense power iteration with identical semantics).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def edgesDf(es: Seq[(String, String)]) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  test("degrees count distinct directed edges per endpoint") {
    import spark.implicits._
    val d = GraphOps.degrees(
      edgesDf(Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))), "src", "dst")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(d("a") == ((2L, 1L, 3L))) // out: b,c; in: c
    assert(d("b") == ((1L, 1L, 2L)))
    assert(d("c") == ((1L, 2L, 3L)))
  }

  /** Local dense reference: same damped formulation, same dangling-mass
    * simplification, sequential summation.
    */
  private def localPagerank(
      es: Seq[(String, String)], iters: Int, damping: Double): Map[String, Double] = {
    val edges = es.distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length.toDouble
    val outDeg = edges.groupBy(_._1).map { case (s, xs) => s -> xs.length }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      edges.foreach { case (s, d) => contrib(d) += rank(s) / outDeg(s) }
      rank = nodes.map(v => v -> ((1.0 - damping) / n + damping * contrib(v))).toMap
    }
    rank
  }

  test("pagerank matches a local dense power iteration and ranks the hub highest") {
    import spark.implicits._
    // star into "hub" + a chain + a dangling node ("z" has no out-edges)
    val es = Seq(
      ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
      ("hub", "e"), ("e", "f"), ("f", "z"))
    val got = GraphOps.pagerank(edgesDf(es), iters = 12)
      .as[(String, Double)].collect().toMap
    val want = localPagerank(es, iters = 12, damping = 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - want(node)) < 1e-9, s"$node: $r vs ${want(node)}")
    }
    // the star center out-ranks every leaf
    assert(got("hub") > got("a") && got("hub") > got("b"))
  }

  test("pagerank plan depth is bounded across iterations (lineage truncated per round)") {
    val es = (0 until 50).map(i => (s"n$i", s"n${(i + 1) % 50}"))
    val pr = GraphOps.pagerank(edgesDf(es), iters = 15)
    // an eager localCheckpoint result reads back as a short scan plan, not
    // a 15-round join tower
    val depth = pr.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(depth < 20, s"plan unexpectedly deep: $depth lines")
    // ring graph: every node converges to the same rank
    val vals = pr.collect().map(_.getDouble(1))
    assert(math.abs(vals.max - vals.min) < 1e-12)
  }
}
