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

  /** Brute-force local triangle reference: per-node count over the
    * canonical undirected simple graph.
    */
  private def localTriangles(es: Seq[(String, String)]): Map[String, Long] = {
    val und = es.collect { case (a, b) if a != b =>
      if (a < b) (a, b) else (b, a)
    }.distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if und((a, b)) && und((a, c)) && und((b, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangleCounts on K4: every node sits in C(3,2)=3 triangles") {
    import spark.implicits._
    val vs = Seq("a", "b", "c", "d")
    val es = for (i <- vs.indices; j <- (i + 1) until vs.size) yield (vs(i), vs(j))
    val got = GraphOps.triangleCounts(edgesDf(es), "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == vs.map(_ -> 3L).toMap)
  }

  test("triangleCounts ignores self-loops, reverse edges, and parallel duplicates") {
    import spark.implicits._
    val es = Seq(
      ("a", "b"), ("b", "a"), ("a", "b"), // one undirected edge
      ("b", "c"), ("c", "a"),
      ("a", "a"), // self-loop
      ("c", "d")) // dangling edge, no triangle
    val got = GraphOps.triangleCounts(edgesDf(es), "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangleCounts matches a brute-force reference on a random graph with a hub") {
    import spark.implicits._
    // seeded pseudo-random graph + a celebrity hub connected to everyone:
    // the degree-orientation must still count exactly (hub edges all
    // orient INTO the hub, so the hub generates no quadratic wedge set)
    val rnd = new scala.util.Random(7)
    val n = 40
    val base = for {
      i <- 0 until n; j <- (i + 1) until n if rnd.nextDouble() < 0.12
    } yield (s"v$i", s"v$j")
    val hub = (0 until n).map(i => (s"v$i", "hub"))
    val es = rnd.shuffle(base ++ hub).map { case (a, b) =>
      if (rnd.nextBoolean()) (a, b) else (b, a) // random orientation noise
    }
    val got = GraphOps.triangleCounts(edgesDf(es), "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == localTriangles(es))
  }

  /** Local replica of the deterministic synchronous LPA rule: adopt the
    * most frequent neighbor label, ties to the minimum label.
    */
  private def localLpa(es: Seq[(String, String)], iters: Int): Map[String, String] = {
    val bi = es.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = bi.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    var labels = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 0 until iters) {
      labels = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(labels).map { case (l, xs) => l -> xs.size }
        val mc = counts.values.max
        v -> counts.collect { case (l, c) if c == mc => l }.min
      }
    }
    labels
  }

  test("label propagation: two cliques joined by a bridge resolve to two communities") {
    import spark.implicits._
    val cliqueA = Seq("a1", "a2", "a3", "a4")
    val cliqueB = Seq("b1", "b2", "b3", "b4")
    def clique(vs: Seq[String]) =
      for (i <- vs.indices; j <- (i + 1) until vs.size) yield (vs(i), vs(j))
    val es = clique(cliqueA) ++ clique(cliqueB) :+ (("a1", "b1"))
    val got = GraphOps.labelPropagation(edgesDf(es), iters = 3, "src", "dst")
      .as[(String, String)].collect().toMap
    assert(got == localLpa(es, 3))
    // the two cliques carry distinct labels
    assert(cliqueA.map(got).distinct.size == 1)
    assert(cliqueB.map(got).distinct.size == 1)
    assert(got("a2") != got("b2"))
  }

  test("label propagation matches the local replica on a random graph, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val es = for {
      i <- 0 until 30; j <- (i + 1) until 30 if rnd.nextDouble() < 0.15
    } yield (s"v$i", s"v$j")
    val want = localLpa(es, 4)
    val got = GraphOps.labelPropagation(edgesDf(es).repartition(13), iters = 4, "src", "dst")
      .as[(String, String)].collect().toMap
    assert(got == want)
  }

  /** Brute-force hub-pruned neighborhood Jaccard: neighbors above the
    * degree cap are dropped from every neighbor set (numerator AND
    * denominator), matching the operator contract.
    */
  private def localJaccard(
      es: Seq[(String, String)], minSim: Double, maxDeg: Long): Map[(String, String), (Long, Double)] = {
    val bi = es.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = bi.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    val pruned = nbrs.map { case (v, ns) => v -> ns.filter(w => deg(w) <= maxDeg) }
    val vs = pruned.keys.toSeq.sorted
    (for {
      i <- vs.indices; j <- (i + 1) until vs.size
      (a, b) = (vs(i), vs(j))
      inter = (pruned(a) & pruned(b)).size.toLong if inter > 0
      jac = BigDecimal(inter.toDouble / (pruned(a).size + pruned(b).size - inter).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= minSim
    } yield (a, b) -> ((inter, jac))).toMap
  }

  test("neighborJaccard matches brute force; hubs are pruned from the neighbor sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = for {
      i <- 0 until 25; j <- (i + 1) until 25 if rnd.nextDouble() < 0.2
    } yield (s"v$i", s"v$j")
    val hub = (0 until 25).map(i => (s"v$i", "hub"))
    val es = base ++ hub
    for (cap <- Seq(1000L, 10L)) { // exact Jaccard, and hub-pruned
      val got = GraphOps.neighborJaccard(edgesDf(es), 0.1, cap, "src", "dst")
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(got == localJaccard(es, 0.1, cap), s"cap=$cap")
    }
    // with the cap below the hub's degree, the hub is dropped from every
    // neighbor SET but still appears as an endpoint (scored over its own
    // low-degree neighbors)
    val capped = GraphOps.neighborJaccard(edgesDf(es), 0.0, 10L, "src", "dst")
      .as[(String, String, Long, Double)].collect()
    assert(capped.exists(r => r._1 == "hub" || r._2 == "hub"))
  }

  test("embedding export: contiguous dense ids, bijective decode back to the triples") {
    import spark.implicits._
    val triples = Seq(
      ("dA", "treated_by", "x1"), ("dA", "treated_by", "x2"),
      ("dB", "has_finding", "l1"), ("dB", "treated_by", "x1"),
      ("dA", "has_finding", "l1"), ("dA", "has_finding", "l1")) // dup collapses
      .toDF("subj", "pred", "obj")
    val ents = graft.graph.KgExport.entityVocab(triples)
      .as[(String, Int)].collect().toMap
    val rels = graft.graph.KgExport.relationVocab(triples)
      .as[(String, Int)].collect().toMap
    assert(ents.values.toSeq.sorted == (0 until ents.size))
    assert(rels.values.toSeq.sorted == (0 until rels.size))
    // sorted-name order
    assert(ents.toSeq.sortBy(_._1).map(_._2) == (0 until ents.size))
    val coded = graft.graph.KgExport.embeddingExport(triples)
      .as[(Int, Int, Int)].collect().toSet
    val entOf = ents.map(_.swap); val relOf = rels.map(_.swap)
    val decoded = coded.map { case (h, r, t) => (entOf(h), relOf(r), entOf(t)) }
    assert(decoded == Set(
      ("dA", "treated_by", "x1"), ("dA", "treated_by", "x2"),
      ("dB", "has_finding", "l1"), ("dB", "treated_by", "x1"),
      ("dA", "has_finding", "l1")))
  }

  test("negative sampling: type-constrained, true-triple-free, partition-independent") {
    import spark.implicits._
    val triples = Seq(
      ("d1", "treated_by", "x1", "Drug"), ("d1", "treated_by", "x2", "Drug"),
      ("d2", "treated_by", "x1", "Drug"), ("d1", "has_finding", "l1", "Laboratory"),
      ("d3", "located_in", "a1", "Anatomical"))
      .toDF("subj", "pred", "obj", "obj_type")
    val concepts = Seq(
      ("x1", "Drug"), ("x2", "Drug"), ("x3", "Drug"), ("x4", "Drug"),
      ("l1", "Laboratory"), ("l2", "Laboratory"),
      ("a1", "Anatomical"), ("a2", "Anatomical"), ("a3", "Anatomical"))
      .toDF("concept_id", "entity_type")
    val out = graft.graph.NegativeSampling.corruptObjects(triples, concepts, k = 3, seed = 99L)
      .as[(String, String, String, String, Int)].collect().toSeq.sorted
    assert(out.nonEmpty)
    val typeOf = Map("x1" -> "Drug", "x2" -> "Drug", "x3" -> "Drug", "x4" -> "Drug",
      "l1" -> "Laboratory", "l2" -> "Laboratory",
      "a1" -> "Anatomical", "a2" -> "Anatomical", "a3" -> "Anatomical")
    val pos = Set(("d1", "treated_by", "x1"), ("d1", "treated_by", "x2"),
      ("d2", "treated_by", "x1"), ("d1", "has_finding", "l1"), ("d3", "located_in", "a1"))
    out.foreach { case (s, p, o, neg, j) =>
      assert(typeOf(neg) == typeOf(o), s"cross-type corruption: $o -> $neg")
      assert(neg != o)
      assert(!pos((s, p, neg)), s"corruption is a true triple: ($s,$p,$neg)")
      assert(j >= 0 && j < 3)
    }
    // sequential replica agreement (the fixture-oracle contract)
    val candsByType = typeOf.toSeq.groupBy(_._2)
      .map { case (t, xs) => t -> xs.map(_._1).sorted.toIndexedSeq }
    val expect = Seq(
      ("d1", "treated_by", "x1", "Drug"), ("d1", "treated_by", "x2", "Drug"),
      ("d2", "treated_by", "x1", "Drug"), ("d1", "has_finding", "l1", "Laboratory"),
      ("d3", "located_in", "a1", "Anatomical")).flatMap { case (s, p, o, ot) =>
      val cands = candsByType(ot)
      (0 until 3).flatMap { j =>
        val neg = cands(graft.graph.NegativeSampling.drawIndex(99L, s, p, o, j, cands.size))
        if (neg != o && !pos((s, p, neg))) Some((s, p, o, neg, j)) else None
      }
    }.sorted
    assert(out == expect)
    // partition independence: a repartitioned input draws the same sample
    val re = graft.graph.NegativeSampling.corruptObjects(
      triples.repartition(7), concepts, k = 3, seed = 99L)
      .as[(String, String, String, String, Int)].collect().toSeq.sorted
    assert(re == out)
  }

  private def triplesDf(ts: Seq[(String, String, String)]) = {
    import spark.implicits._
    ts.toDF("subj", "pred", "obj")
  }

  /** Brute-force wedge reference: unordered pairs of distinct edges
    * sharing a subject, keyed by the sorted predicate pair.
    */
  private def localWedges(ts: Seq[(String, String, String)]): Map[(String, String), Long] = {
    val es = ts.distinct
    val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for {
      i <- es.indices; j <- (i + 1) until es.size
      if es(i)._1 == es(j)._1
    } {
      val key = if (es(i)._2 <= es(j)._2) (es(i)._2, es(j)._2) else (es(j)._2, es(i)._2)
      counts(key) += 1
    }
    counts.toMap
  }

  test("predicateWedges: closed-form counts, duplicate edges collapse, zero rows filtered") {
    import spark.implicits._
    val ts = Seq(
      ("s1", "p1", "o1"), ("s1", "p1", "o2"), ("s1", "p1", "o2"), // dup collapses
      ("s1", "p2", "o3"), ("s2", "p2", "o1"))
    val got = GraphOps.predicateWedges(triplesDf(ts))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // s1 has two distinct p1 edges (C(2,2)=1) and one p2 edge (2·1 cross);
    // single-edge (p,p) combinations yield 0 and must not appear
    assert(got == Map(("p1", "p1") -> 1L, ("p1", "p2") -> 2L))
    assert(got == localWedges(ts))
  }

  test("predicateWedges matches brute force on a random multigraph with a hub subject") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ts = (0 until 400).map { _ =>
      val s = if (rnd.nextInt(3) == 0) "hub" else s"s${rnd.nextInt(10)}"
      (s, s"p${rnd.nextInt(4)}", s"o${rnd.nextInt(25)}")
    }
    val got = GraphOps.predicateWedges(triplesDf(ts))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == localWedges(ts))
  }

  test("ruleImplication: support, co-support, and confidence per ordered predicate pair") {
    import spark.implicits._
    val ts = Seq(
      ("d1", "treated_by", "x1"), ("d1", "treated_by", "x2"), // one subject, counted once
      ("d1", "has_finding", "l1"),
      ("d2", "treated_by", "x1"),
      ("d3", "has_finding", "l2"))
    val got = GraphOps.ruleImplication(triplesDf(ts))
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // treated_by subjects: d1, d2 (2); has_finding subjects: d1, d3 (2); both: d1
    assert(got(("treated_by", "has_finding")) == ((2L, 1L, 0.5)))
    assert(got(("has_finding", "treated_by")) == ((2L, 1L, 0.5)))
    assert(got.size == 2)
  }

  /** Local Dijkstra reference over a bi-directed weighted edge list,
    * truncated to paths of at most `rounds` edges (Bellman-Ford rounds).
    */
  private def localSssp(
      es: Seq[(String, String, Long)], seeds: Seq[String], rounds: Int): Map[String, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = es.flatMap { case (s, d, w) => dist.get(s).map(x => d -> (x + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).min }
    }
    dist
  }

  test("shortestPaths: a cheap long path beats an expensive direct edge") {
    import spark.implicits._
    val es = Seq(("a", "b", 5L), ("a", "c", 1L), ("c", "b", 1L))
    val bi = es ++ es.map { case (s, d, w) => (d, s, w) }
    val at3 = GraphOps.shortestPaths(bi.toDF("src", "dst", "w"), Seq("a"), rounds = 3)
      .as[(String, Long)].collect().toMap
    assert(at3 == Map("a" -> 0L, "b" -> 2L, "c" -> 1L))
    // round-bounded: within one edge the direct w=5 is the best known
    val at1 = GraphOps.shortestPaths(bi.toDF("src", "dst", "w"), Seq("a"), rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(at1 == Map("a" -> 0L, "b" -> 5L, "c" -> 1L))
  }

  test("shortestPaths matches the local reference on a random graph; unreached nodes absent") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val core = (0 until 120).map { _ =>
      (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}", 1L + rnd.nextInt(9))
    }.filter(e => e._1 != e._2)
    // an island component no seed can reach
    val es = core ++ Seq(("i1", "i2", 1L), ("i2", "i1", 1L))
    val bi = (es ++ es.map { case (s, d, w) => (d, s, w) }).distinct
    val got = GraphOps.shortestPaths(bi.toDF("src", "dst", "w"), Seq("n0", "n7"), rounds = 6)
      .as[(String, Long)].collect().toMap
    assert(got == localSssp(bi, Seq("n0", "n7"), rounds = 6))
    assert(!got.contains("i1") && !got.contains("i2"))
  }

  test("shortestPaths plan depth is bounded across rounds (lineage truncated per round)") {
    import spark.implicits._
    val ring = (0 until 40).map(i => (s"n$i", s"n${(i + 1) % 40}", 2L))
    val bi = ring ++ ring.map { case (s, d, w) => (d, s, w) }
    val sp = GraphOps.shortestPaths(bi.toDF("src", "dst", "w"), Seq("n0"), rounds = 12)
    val depth = sp.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(depth < 20, s"plan unexpectedly deep: $depth lines")
    // ring of weight-2 edges: dist is 2·min(hops clockwise, counter)
    val got = sp.as[(String, Long)].collect().toMap
    (0 until 40).foreach { i =>
      val hops = math.min(i, 40 - i)
      if (hops <= 12) assert(got(s"n$i") == 2L * hops)
    }
  }

  /** Sequential peeling reference: `rounds` rounds of drop-degree-<k over
    * the undirected simple graph, then surviving (node, degree).
    */
  private def localKCore(
      es: Seq[(String, String)], k: Long, rounds: Int): Map[String, Long] = {
    var bi = es.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).distinct
    for (_ <- 1 to rounds) {
      val deg = bi.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      bi = bi.filter(e => keep(e._1) && keep(e._2))
    }
    bi.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("kCore: ring survives k=2 intact; star is fully peeled; pendant chain peels") {
    import spark.implicits._
    val ring = (0 until 6).map(i => (s"r$i", s"r${(i + 1) % 6}"))
    // star: hub with 5 leaves — every leaf has degree 1, so k=2 peels the
    // leaves in round 1 and the bare hub in round 2
    val star = (1 to 5).map(i => ("hub", s"leaf$i"))
    // pendant chain hanging off the ring: peels one layer per round
    val chain = Seq(("r0", "c1"), ("c1", "c2"))
    val edges = (ring ++ star ++ chain).toDF("src", "dst")
    val got = GraphOps.kCore(edges, k = 2L, rounds = 3, "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == (0 until 6).map(i => s"r$i" -> 2L).toMap)
    assert(got == localKCore(ring ++ star ++ chain, 2L, 3))
  }

  test("kCore matches the sequential peeling reference on a random graph at several k") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val es = (0 until 300).map { _ =>
      (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}")
    }
    val df = es.toDF("src", "dst")
    for (k <- Seq(2L, 4L, 7L)) {
      val got = GraphOps.kCore(df, k, rounds = 4, "src", "dst")
        .as[(String, Long)].collect().toMap
      assert(got == localKCore(es, k, 4), s"k=$k mismatch")
    }
  }

  test("kCore: bounded rounds peel exactly one chain layer per round") {
    import spark.implicits._
    // a path a0-a1-...-a5: endpoints have degree 1; each k=2 round peels
    // both current endpoints, so after 2 rounds the middle segment remains
    val path = (0 until 5).map(i => (s"a$i", s"a${i + 1}"))
    val after2 = GraphOps.kCore(path.toDF("src", "dst"), k = 2L, rounds = 2, "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(after2 == localKCore(path, 2L, 2))
    assert(after2.keySet == Set("a2", "a3")) // a0,a5 round 1; a1,a4 round 2
    // full convergence: a path has no 2-core
    val after4 = GraphOps.kCore(path.toDF("src", "dst"), k = 2L, rounds = 4, "src", "dst")
      .as[(String, Long)].collect()
    assert(after4.isEmpty)
  }

  test("pmiWeights matches exact sequential counts and pinned-order IEEE lift") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val member = (0 until 400).map(_ => (s"d${rnd.nextInt(40)}", s"c${rnd.nextInt(8)}")).distinct
    val got = GraphOps.pmiWeights(member.toDF("doc_id", "concept_id"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val nDocs = member.map(_._1).distinct.size
    val ni = member.groupBy(_._2).map { case (c, xs) => c -> xs.size }
    val expected = member.groupBy(_._1).values.flatMap { ms =>
      val cs = ms.map(_._2).distinct
      for (a <- cs; b <- cs if a < b) yield (a, b)
    }.groupBy(identity).map { case ((a, b), xs) =>
      val nAb = xs.size.toLong
      val lift = (nAb.toDouble * nDocs.toDouble) / (ni(a).toDouble * ni(b).toDouble)
      (a, b) -> ((nAb, lift, BigDecimal(math.log(lift))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (n, lift, pmi)) =>
      val (en, elift, epmi) = expected(k)
      assert(n == en && lift == elift, s"$k: exact lift mismatch") // bit-identical
      assert(math.abs(pmi - epmi) < 2e-6, s"$k: pmi $pmi vs $epmi")
    }
    // sanity: a pair of rare always-together concepts outranks hub pairs
    val perfect = GraphOps.pmiWeights(
      (Seq(("d1", "x"), ("d1", "y")) ++ (1 to 20).map(i => (s"d$i", "hub")) ++
        (1 to 20).map(i => (s"d$i", s"f$i"))).toDF("doc_id", "concept_id"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(perfect(("x", "y")) > perfect.getOrElse(("f1", "hub"), Double.MinValue))
  }

  test("adamicAdar matches a brute-force reference and the degree cap excludes hubs") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val es = (0 until 220).map(_ => (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
    val cap = 12L
    val got = GraphOps.adamicAdar(es.toDF("src", "dst"), maxDegree = cap, "src", "dst")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    // brute reference with the same eligibility window
    val bi = es.filter(e => e._1 != e._2).flatMap(e => Seq(e, (e._2, e._1))).distinct
    val adj = bi.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val deg = adj.map { case (n, xs) => n -> xs.size.toLong }
    val expected = scala.collection.mutable.Map.empty[(String, String), Double]
    for ((z, nbrs) <- adj if deg(z) >= 2 && deg(z) <= cap) {
      val sorted = nbrs.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size) {
        val k = (sorted(i), sorted(j))
        expected(k) = expected.getOrElse(k, 0.0) + 1.0 / math.log(deg(z).toDouble)
      }
    }
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 2e-6, s"$k: $v") }
    // hub exclusion: a star hub above the cap generates no wedges
    val star = (1 to 15).map(i => ("hub", s"l$i")) :+ (("l1", "l2"))
    val aa = GraphOps.adamicAdar(star.toDF("src", "dst"), maxDegree = 10L, "src", "dst")
      .collect()
    // the only eligible shared neighbors are l1/l2 (deg 2); hub (deg 15)
    // generates NO wedges, so no leaf-leaf pair appears
    val pairs = aa.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("hub", "l2"), ("hub", "l1")))
  }
}
