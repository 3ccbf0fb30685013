package graft

import graft.core.{Bloom, CountMin, DdHist, Hashing, Sketch}
import graft.functions.{BloomBuild, BloomMightContain, CmsBuild, CmsEstimate, DdQuantiles, Hash64, Registry}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the Bloom / Count-Min / DDSketch mergeable sketches
  * (kernels, aggregates, probe expressions, and the bloom-prefiltered
  * decontamination operator's exactness claim).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  // ------------------------------------------------------------- Bloom

  test("bloom kernel: no false negatives; fpp near the design point; merge = union") {
    val n = 20000
    val m = Bloom.optimalBits(n, 0.01)
    val k = Bloom.optimalK(m, n)
    val b = Bloom.create(m, k)
    val keys = (0 until n).map(i => Hashing.hashString(s"key-$i"))
    keys.foreach(Bloom.add(b, _))
    assert(keys.forall(Bloom.mightContain(b, _)), "false negative!")
    val probes = (0 until 50000).map(i => Hashing.hashString(s"absent-$i"))
    val fp = probes.count(Bloom.mightContain(b, _))
    val fpp = fp.toDouble / probes.size
    assert(fpp < 0.03, s"fpp=$fpp, design 0.01")

    // chunked merge equals the sequential build bit-for-bit
    val merged = Bloom.create(m, k)
    keys.grouped(2857).foreach { chunk =>
      val part = Bloom.create(m, k)
      chunk.foreach(Bloom.add(part, _))
      Bloom.merge(merged, part)
    }
    assert(merged.sameElements(b))
    // serialization round-trips and the cached probe agrees
    val bytes = Bloom.toBytes(b)
    assert(Bloom.fromBytes(bytes).sameElements(b))
    assert(keys.forall(Bloom.mightContainCached(bytes, _)))
  }

  test("bloom sizing: optimalBits/optimalK track the textbook formulas") {
    val m = Bloom.optimalBits(1000000, 0.01)
    // -n ln p / ln2^2 = 9.585 bits/key at 1% → within one 64-bit word
    assert(math.abs(m - 9585059) < 64, s"m=$m")
    assert(Bloom.optimalK(m, 1000000) == 7) // (m/n) ln2 ≈ 6.64 → 7
  }

  // --------------------------------------------------------- Count-Min

  test("count-min kernel: never under-counts, exact at low load, additive merge") {
    val cms = CountMin.create(5, 2048)
    val words = (0 until 300).map(i => s"w$i")
    words.zipWithIndex.foreach { case (w, i) =>
      (0 to i % 7).foreach(_ => CountMin.add(cms, Hashing.hashString(w)))
    }
    words.zipWithIndex.foreach { case (w, i) =>
      val truth = (i % 7) + 1L
      val est = CountMin.estimate(cms, Hashing.hashString(w))
      assert(est >= truth, s"under-count for $w: $est < $truth")
      assert(est <= truth + 5, s"wild over-count at low load for $w: $est vs $truth")
    }
    // chunked merge is bit-identical to sequential (elementwise add)
    val tokens = (0 until 50000).map(i => s"t${i % 900}")
    val seqCms = CountMin.create(5, 2048)
    tokens.foreach(t => CountMin.add(seqCms, Hashing.hashString(t)))
    val merged = CountMin.create(5, 2048)
    tokens.grouped(3083).foreach { chunk =>
      val part = CountMin.create(5, 2048)
      chunk.foreach(t => CountMin.add(part, Hashing.hashString(t)))
      CountMin.merge(merged, part)
    }
    assert(merged.sameElements(seqCms))
    val bytes = CountMin.toBytes(seqCms)
    assert(CountMin.estimateCached(bytes, Hashing.hashString("t17")) ==
      CountMin.estimate(seqCms, Hashing.hashString("t17")))
  }

  // ----------------------------------------------------------- DDSketch

  test("ddsketch kernel: relative error within alpha; merge bit-identical") {
    val alpha = DdHist.DefaultAlpha
    val h = DdHist.create(alpha)
    val values = (1 to 100000).map(i => (Hashing.mix64(i.toLong) & 0xFFFFFL) + 1L)
    values.foreach(DdHist.add(h, alpha, _))
    val sorted = values.sorted
    Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99).foreach { q =>
      val est = DdHist.quantile(h, alpha, q)
      val rank = math.max(1, math.ceil(q * sorted.size).toInt)
      val truth = sorted(rank - 1).toDouble
      assert(math.abs(est - truth) / truth <= alpha + 1e-9,
        s"q=$q est=$est truth=$truth relerr=${math.abs(est - truth) / truth}")
    }
    // zero values land in the zero bucket and report 0.0 at low quantiles
    val hz = DdHist.create(alpha)
    (1 to 10).foreach(_ => DdHist.add(hz, alpha, 0L))
    DdHist.add(hz, alpha, 50L)
    assert(DdHist.quantile(hz, alpha, 0.5) == 0.0)
    assert(math.abs(DdHist.quantile(hz, alpha, 1.0) - 50.0) / 50.0 <= alpha)
    // chunked merge bit-identical
    val merged = DdHist.create(alpha)
    values.grouped(7919).foreach { chunk =>
      val part = DdHist.create(alpha)
      chunk.foreach(DdHist.add(part, alpha, _))
      DdHist.merge(merged, part)
    }
    assert(merged.sameElements(h))
    assert(Sketch.bytesToLongs(Sketch.longsToBytes(h)).sameElements(h))
  }

  // ------------------------------------------------- aggregates on Spark

  test("aggregates: partition-independent, equal to sequential kernels; probes codegen") {
    import spark.implicits._
    val rows = (0 until 30000).map(i => (s"g${i % 3}", s"tok-${i % 750}"))
    val df = rows.toDF("grp", "v")

    // Bloom: distributed filter == sequential filter, probed via the expression
    val seqBloom = Bloom.create(1 << 14, 5)
    rows.filter(_._1 == "g0").foreach(r => Bloom.add(seqBloom, Hashing.hashString(r._2)))
    val aggBloom = df.filter($"grp" === "g0").repartition(17)
      .agg(BloomBuild.bloom_build($"v", 1 << 14, 5)).head.getAs[Array[Byte]](0)
    assert(aggBloom.sameElements(Bloom.toBytes(seqBloom)))
    // 750 ≡ 0 (mod 3) pins tok-j to group g(j%3) — probe g0's tokens
    val probed = Seq("tok-0", "tok-699", "nope-1", "nope-2").toDF("t")
      .select($"t", BloomMightContain.bloom_might_contain(
        lit(aggBloom), Hash64.hash64($"t")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probed("tok-0") && probed("tok-699"))
    // absent probes MAY false-positive, but at 16 Kbit / 750 keys the rate
    // is ~1e-9 per probe; a hit here would indicate a broken hash domain
    assert(!probed("nope-1") && !probed("nope-2"))

    // CMS per group: distributed == sequential, for several partitionings
    def runCms(d: org.apache.spark.sql.DataFrame): Map[String, Array[Byte]] =
      d.groupBy("grp").agg(CmsBuild.cms_build($"v").as("cms"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val expectedCms = rows.groupBy(_._1).map { case (g, vs) =>
      val c = CountMin.create(CountMin.DefaultDepth, CountMin.DefaultWidth)
      vs.foreach { case (_, v) => CountMin.add(c, Hashing.hashString(v)) }
      g -> CountMin.toBytes(c)
    }
    for (d <- Seq(df, df.repartition(13, $"v"), df.repartition(1))) {
      val got = runCms(d)
      assert(got.keySet == expectedCms.keySet)
      expectedCms.foreach { case (g, bytes) => assert(got(g).sameElements(bytes), s"group $g") }
    }
    // probe expression agrees with the kernel
    val est = df.groupBy("grp").agg(CmsBuild.cms_build($"v").as("cms"))
      .select($"grp", CmsEstimate.cms_estimate($"cms", Hash64.hash64(lit("tok-5"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.count(r => r._1 == "g2" && r._2 == "tok-5").toLong
    assert(est("g2") >= truth)

    // DDSketch: estimates equal the sequential kernel exactly (same doubles)
    val lens = (0 until 20000).map(i => (s"g${i % 2}", (Hashing.mix64(i.toLong) & 0x3FFFL) + 1L))
    val ldf = lens.toDF("grp", "len")
    def runDd(d: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
      d.groupBy("grp").agg(DdQuantiles.dd_quantiles($"len", Seq(0.25, 0.5, 0.95)).as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val expDd = lens.groupBy(_._1).map { case (g, vs) =>
      val h = DdHist.create(DdHist.DefaultAlpha)
      vs.foreach { case (_, v) => DdHist.add(h, DdHist.DefaultAlpha, v) }
      g -> Seq(0.25, 0.5, 0.95).map(q => DdHist.quantile(h, DdHist.DefaultAlpha, q))
    }
    assert(runDd(ldf) == expDd)
    assert(runDd(ldf.repartition(11, $"len")) == expDd)
  }

  test("SQL registration: bloom/cms/dd callable from spark.sql") {
    import spark.implicits._
    Registry.registerAll(spark)
    (0 until 2000).map(i => s"s${i % 400}").toDF("v").createOrReplaceTempView("sk_in")
    val bloomRow = spark.sql(
      "SELECT bloom_build(v, 16384, 5) AS b FROM sk_in").head.getAs[Array[Byte]](0)
    val hits = spark.sql(
      "SELECT sum(CAST(bloom_might_contain((SELECT bloom_build(v, 16384, 5) FROM sk_in), hash64(v)) AS INT)) FROM sk_in")
      .head.getLong(0)
    assert(hits == 2000L, "bloom must contain every inserted value")
    assert(bloomRow.length == 8 + 16384 / 8)
    val cmsEst = spark.sql(
      "SELECT cms_estimate((SELECT cms_build(v) FROM sk_in), hash64('s7')) AS n").head.getLong(0)
    assert(cmsEst >= 5L) // s7 occurs 5 times
    val dd = spark.sql(
      "SELECT dd_quantiles(CAST(length(v) AS BIGINT), array(0.5)) FROM sk_in")
      .head.getSeq[Double](0)
    assert(dd.length == 1 && dd.head > 0.0)
  }

  test("sketch aggregates plan with a map-side partial phase, no window/UDF") {
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_docs_cms_counts", "q_docs_length_sketch",
        "q_docs_decontaminate_bloom")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("ScalaUDF") && !p.contains("Window"), s"$name: ${p.take(400)}")
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(400)}")
    }
    // the sketch groupBys must partial-aggregate (registers merge map-side;
    // token/length values never reach the exchange)
    for (name <- Seq("q_docs_cms_counts", "q_docs_length_sketch")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      assert(p.contains("ObjectHashAggregate") && p.contains("partial"),
        s"$name lost its partial sketch phase: ${p.take(600)}")
    }
  }

  test("bloom-prefiltered decontamination equals the exact path") {
    import spark.implicits._
    val docs = (0L until 600L).map { i =>
      val tail = if (i % 7 == 0) s"shared marker phrase ${i % 3}" else s"unique tail $i body"
      (i, s"doc $i has some $tail")
    }.toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" % 50 === 0)
    val exact = graft.ops.Decontaminate.contaminatedIds(docs, bench, "text", "doc_id")
      .as[Long].collect().sorted
    // a deliberately tiny bloom (512 bits) forces a real false-positive
    // rate through the verify join — exactness must survive it
    val viaBloom = graft.ops.Decontaminate.contaminatedIdsBloom(
      docs, bench, "text", "doc_id", w = 3, mBits = 512, k = 3)
      .as[Long].collect().sorted
    assert(viaBloom.sameElements(exact))
  }
}
