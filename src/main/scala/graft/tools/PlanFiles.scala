package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` per query into individual files — the
  * `plans/rNN/<query>_{before,after}.txt` evidence artifacts of the
  * optimization rounds (PlanDump writes the single aggregated PLANS.md).
  *
  * Usage: sbt "runMain graft.tools.PlanFiles <sfDir> <outDir> <suffix> [query ...]"
  * (no query args = the Bench.headline set).
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "plans/r06"
    val suffix = if (args.length > 2) args(2) else "before"
    val names = if (args.length > 3) args.drop(3).toSeq else graft.Bench.headline
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val plan =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          catch { case e: Throwable => s"(failed: $e)" }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan.trim + "\n")
        spark.catalog.clearCache()
      }
    }
    println(s"[planfiles] wrote ${names.size} plans to $outDir (*_$suffix.txt)")
    spark.stop()
  }
}
