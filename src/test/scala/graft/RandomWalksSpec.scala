package graft

import graft.graph.RandomWalks
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random-walk corpus generation: the distributed broadcast-join
  * steps must equal a naive sequential replica using the same draw
  * kernel under any partitioning, every hop must be a real edge, and the
  * maxDegree cap must bound hub fan-out deterministically.
  */
class RandomWalksSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  /** Sequential replica: sorted capped adjacency + stepDraw. */
  private def localWalks(
      es: Seq[(String, String)],
      walksPerNode: Int,
      walkLen: Int,
      seed: Long,
      maxDegree: Int = 1024): Seq[(String, Int, Int, String)] = {
    val adj = es.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).distinct
      .groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).distinct.sorted.take(maxDegree).toIndexedSeq }
    adj.keys.toSeq.sorted.flatMap { start =>
      (0 until walksPerNode).flatMap { w =>
        var cur = start
        (start, w, 0, start) +: (1 to walkLen).map { st =>
          val nbrs = adj(cur)
          cur = nbrs(RandomWalks.stepDraw(seed, start, w, st, cur, nbrs.size))
          (start, w, st, cur)
        }
      }
    }
  }

  private def collectWalks(df: DataFrame): Seq[(String, Int, Int, String)] =
    df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq.sortBy(x => (x._1, x._2, x._3))

  test("walks match the sequential replica on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val es = (0 until 200).map(_ => (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
    val got = collectWalks(
      RandomWalks.walks(es.toDF("src", "dst"), walksPerNode = 3, walkLen = 5, seed = 7L))
    assert(got == localWalks(es, 3, 5, 7L).sortBy(x => (x._1, x._2, x._3)))
  }

  test("result is partition-independent and every hop is a graph edge") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val es = (0 until 150).map(_ => (s"v${rnd.nextInt(20)}", s"v${rnd.nextInt(20)}"))
    val df = es.toDF("src", "dst")
    val a = collectWalks(RandomWalks.walks(df, 2, 4, seed = 99L))
    val b = collectWalks(RandomWalks.walks(df.repartition(11), 2, 4, seed = 99L))
    assert(a == b)
    // row count: nodes × walksPerNode × (walkLen + 1) — no walk strands
    val nodes = es.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2)).distinct
    assert(a.size == nodes.size * 2 * 5)
    // each consecutive pair within a walk is an undirected edge
    val edgeSet = es.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).toSet
    a.groupBy(x => (x._1, x._2)).values.foreach { walk =>
      walk.sortBy(_._3).map(_._4).sliding(2).foreach {
        case Seq(u, v) => assert(edgeSet((u, v)), s"hop $u->$v is not an edge")
        case _ =>
      }
    }
  }

  test("maxDegree cap: hub walks only visit the first-k sorted neighbors") {
    import spark.implicits._
    val leaves = (0 until 9).map(i => s"leaf$i")
    val es = leaves.map(l => ("hub", l))
    val got = collectWalks(
      RandomWalks.walks(es.toDF("src", "dst"), 4, 3, seed = 3L, maxDegree = 4))
    // every hop LEAVING the hub lands in its first-4 sorted neighbors
    // (walks may START at any leaf, so only post-hub positions are capped)
    val first4 = leaves.sorted.take(4).toSet
    got.groupBy(x => (x._1, x._2)).values.foreach { walk =>
      walk.sortBy(_._3).map(_._4).sliding(2).foreach {
        case Seq("hub", next) => assert(first4(next), s"hub hopped outside the cap: $next")
        case _ =>
      }
    }
    assert(got == localWalks(es, 4, 3, 3L, maxDegree = 4).sortBy(x => (x._1, x._2, x._3)))
  }

  test("skipGramPairs matches a local sliding-window count; pairs never cross walks") {
    import spark.implicits._
    // two walks with a shared node so cross-walk leakage would be visible
    val walkRows = Seq(
      ("s1", 0, 0, "a"), ("s1", 0, 1, "b"), ("s1", 0, 2, "c"), ("s1", 0, 3, "a"),
      ("s2", 0, 0, "c"), ("s2", 0, 1, "a"), ("s2", 0, 2, "c"))
    val got = RandomWalks.skipGramPairs(walkRows.toDF("start", "walk", "step", "node"), window = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = walkRows.groupBy(x => (x._1, x._2)).values.flatMap { walk =>
      val byStep = walk.sortBy(_._3)
      for {
        c <- byStep; x <- byStep
        d = math.abs(c._3 - x._3) if d >= 1 && d <= 2
      } yield (c._4, x._4)
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(got == expected)
    // symmetric by construction
    got.foreach { case ((c, x), n) => assert(got((x, c)) == n) }
  }
}
