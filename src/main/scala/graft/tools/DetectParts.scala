package graft.tools

import graft.data.{DocsGen, Lexicon}
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** Probe: how many tasks does the detect stage actually run under AQE?
  * (A repartition(col) with tiny shuffle bytes can be coalesced to one
  * partition, serializing the CPU-bound kernel.)
  */
object DetectParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = graft.Fixtures.synthDocs(sfDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val maxTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        println(s"[stage] ${s.stageInfo.stageId} name=${s.stageInfo.name.take(60)} tasks=${s.stageInfo.numTasks}")
        maxTasks.updateAndGet(m => math.max(m, s.stageInfo.numTasks))
      }
    })
    for (rep <- 1 to 4) {
      val docs = DocsGen.docs(DocsGen.gen(spark, n, seed = 42L))
      var t0 = System.nanoTime()
      val nd = docs.count()
      println(f"[probe] rep $rep docs=$nd gen wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      val ns = KgPipeline.sentences(docs).count()
      println(f"[probe] rep $rep sents=$ns gen+explode wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      val nr = KgPipeline.sentences(docs).repartition(32, org.apache.spark.sql.functions.col("doc_id")).count()
      println(f"[probe] rep $rep sents=$nr +repart wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      val cnt = KgPipeline.detectMentions(docs, DocsGen.vocabEntries).count()
      println(f"[probe] rep $rep mentions=$cnt detect wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
