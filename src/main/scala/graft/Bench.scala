package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on `SPARK_GRAFT_SF_DIR` and
  * prints ONE JSON line. The KG pipeline's triples/sec is the north-star
  * throughput metric (BASELINE.md); per-query wall times cover the
  * relational/dedup/ANN operators.
  *
  * Scaling evidence (BASELINE.md §Scaling): run this twice with
  * SPARK_GRAFT_CPUS=8 and =32 on the same SF dir; efficiency =
  * (throughput@32 / throughput@8) / 4.
  */
object Bench {

  /** Headline subset — representative, not exhaustive (Verify covers all). */
  val headline: Seq[String] = Seq(
    "kg_triples",
    "kg_mentions",
    "q_lineitem_pricing",
    "q_orders_by_nation",
    "q_events_topk",
    "q_ann_brute_topk",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard_pairs",
    "q_docs_quality",
    "q_events_sessionize"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // tmpfs shuffle dir when available: the sandbox VM's disk is shared
    // and slow; a real cluster has per-executor local NVMe
    val spark = (if (new java.io.File("/dev/shm").isDirectory)
      builder.config("spark.local.dir", "/dev/shm/graft/bench-local")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up (untimed, standard bench protocol — BASELINE.md §Scaling):
    // one full untimed rep of EVERY headline query. JIT + whole-stage-
    // codegen compilation + parquet footer caches are PER-PLAN, so
    // warming a single query (the r2-r3 protocol) left the first timed
    // rep of each other query absorbing its own first-call compilation —
    // with 5-rep medians that cold rep still drags the median whenever
    // host noise taxes one more rep. The timed series below measures
    // steady-state throughput only.
    var warmupFailed = false
    val names = headline.filter(SparkEntry.queries.contains)
    try {
      names.foreach { name =>
        SparkEntry.queries(name)(spark, sfDir).count()
        spark.catalog.clearCache()
      }
    } catch {
      case e: Throwable =>
        // fail LOUDLY (r2 VERDICT "What's wrong" #4): a broken warm-up
        // means the first timed run absorbs JIT cost — mark the JSON so a
        // distorted bench is never mistaken for a clean one
        warmupFailed = true
        System.err.println(s"[bench] WARM-UP FAILED: $e")
    }

    var triples = 0L
    var triplesSec = 0.0
    val errors = Seq.newBuilder[(String, String)]
    // Noise protocol (r3 VERDICT: one hot 2-minute host window inflated
    // every query ~28%, including ones whose code hadn't changed):
    //  - >= 5 runs per query (median), not 3;
    //  - runs INTERLEAVED across queries — repetition r of every query
    //    runs before repetition r+1 of any, so a transient hot window
    //    taxes one rep of each query instead of every rep of a few;
    //  - per-run raw walls emitted in the JSON ("raw"), so a noisy
    //    window is self-evident in the record instead of silently
    //    shifting medians.
    // Each run is measured cold (internal caches cleared between runs).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val raw = scala.collection.mutable.LinkedHashMap(names.map(_ -> Vector.empty[Double]): _*)
    val rowCounts = scala.collection.mutable.Map.empty[String, Long]
    val failedQ = scala.collection.mutable.Set.empty[String]
    for (rep <- 0 until runs; name <- names if !failedQ(name)) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        rowCounts(name) = fn(spark, sfDir).count()
        raw(name) = raw(name) :+ (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable => // fail LOUDLY: a broken query must not report a fast wall
          errors += name -> e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          failedQ += name
      }
      // hygiene between timed runs: no operator REQUIRES this anymore
      // (r4 removed the dedup persist contracts), but the KG pipeline
      // query still caches mentions internally for its own branches
      spark.catalog.clearCache()
    }
    val results = names.map { name =>
      val times = raw(name)
      val sec = if (times.isEmpty) -1.0 else times.sorted.apply(times.length / 2)
      if (name == "kg_triples" && rowCounts.getOrElse(name, -1L) > 0) {
        triples = rowCounts(name); triplesSec = triples / sec
      }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val rawJson = raw.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = errors.result().map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    // failed queries (sec = -1) are EXCLUDED from the headline total — a
    // broken query must not make the benchmark look faster (ADVICE r2)
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val warm = if (warmupFailed) "\"warmup_failed\":true," else ""
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",$warm"queries":$qs,"raw":$rawJson,"errors":$errs,"sf":"$sfDir","cores":$cpus,"runs_per_query":$runs,"kg_triples":$triples,"kg_triples_per_sec":$triplesSec%.1f}"""
    // stdout (raw — build.sbt routes forked output unprefixed) AND a file,
    // so the driver can parse either
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
