package graft.tools

import graft.data.DocsGen
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** Detect-stage micro-bench (dev tool): isolates the detector's scan +
  * repartition + mapPartitions at one parallelism level with a
  * configurable scan split size.
  */
object DetectBench {
  def main(args: Array[String]): Unit = {
    val staged = args(0)
    val cpus = args(1).toInt
    val maxPart = if (args.length > 2) args(2) else "33554432"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.local.dir", "/dev/shm/graft/local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(staged).as[graft.core.Doc]
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = KgPipeline.detectMentions(docs, DocsGen.vocabEntries, cpus * 2).count()
      println(f"[detectbench] cpus=$cpus maxPart=$maxPart run=$i mentions=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
