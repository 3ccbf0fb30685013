package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Supplementary benchmark main (r6). `graft.Bench` is the frozen driver
  * contract; this main adds what the round-5 verdict asked for WITHOUT
  * touching it:
  *
  *   - noop-sink isolation (guide §1.4): every query timed through
  *     `write.format("noop")` so the computation is measured, not the
  *     count()'s column pruning;
  *   - the K2-on path (`kg_mentions_ngram`) timed round-over-round;
  *   - host forensics per rep: /proc/stat steal + total cpu jiffies next
  *     to each wall, so a noisy-host window is mechanically attributable
  *     (the r5 "uniform +11%" adjudication needed manual forensics).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *        sbt "runMain graft.tools.BenchExtra [reps]"
  * Prints one JSON line (schema independent of the driver's).
  */
object BenchExtra {

  val queries: Seq[String] = graft.Bench.headline :+ "kg_mentions_ngram"

  private def cpuJiffies(): (Long, Long) = {
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      // user nice system idle iowait irq softirq steal guest ...
      (f.sum, if (f.length > 7) f(7) else 0L)
    } catch { case _: Throwable => (0L, 0L) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (new java.io.File("/dev/shm").isDirectory)
      builder.config("spark.local.dir", "/dev/shm/graft/benchx-local")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = queries.filter(SparkEntry.queries.contains)
    def runOnce(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    // warm-up: one untimed rep per query
    names.foreach { n =>
      try runOnce(n)
      catch { case e: Throwable => System.err.println(s"[benchx] warmup $n: $e") }
    }
    val raw = scala.collection.mutable.LinkedHashMap(names.map(_ -> Vector.empty[Double]): _*)
    val steals = scala.collection.mutable.LinkedHashMap(names.map(_ -> Vector.empty[Double]): _*)
    val failed = scala.collection.mutable.Set.empty[String]
    for (rep <- 0 until reps; name <- names if !failed(name)) {
      spark.sparkContext.setJobDescription(s"benchx $name rep $rep")
      val (t0, s0) = cpuJiffies()
      val w0 = System.nanoTime()
      try {
        runOnce(name)
        val wall = (System.nanoTime() - w0) / 1e9
        val (t1, s1) = cpuJiffies()
        raw(name) = raw(name) :+ wall
        steals(name) = steals(name) :+
          (if (t1 > t0) (s1 - s0).toDouble / (t1 - t0) else 0.0)
      } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[benchx] $name FAILED: $e")
      }
    }
    def fmt(m: scala.collection.Map[String, Vector[Double]], digits: Int) =
      m.map { case (k, v) =>
        "\"" + k + "\":" + v.map(x => s"%.${digits}f".format(x)).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val med = raw.map { case (k, v) =>
      "\"" + k + f"\":${if (v.isEmpty) -1.0 else v.sorted.apply(v.length / 2)}%.3f"
    }.mkString("{", ",", "}")
    println(
      s"""{"benchx":1,"sf":"$sfDir","cores":$cpus,"reps":$reps,"medians":$med,"raw":${fmt(raw, 3)},"steal_frac":${fmt(steals, 4)}}""")
    spark.stop()
  }
}
