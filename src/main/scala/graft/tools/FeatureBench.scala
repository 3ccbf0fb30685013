package graft.tools

import graft.data.DocsGen
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** K2 feature-model cost micro-bench (dev tool): the detect stage over a
  * staged docs table WITHOUT vs WITH the n-gram emission model (fit once
  * on the same corpus' gold tags), at one parallelism level — quantifies
  * what the generalization path costs in detector throughput.
  *
  * Usage: runMain graft.tools.FeatureBench <nDocs> <cpus> [runs]
  */
object FeatureBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 300000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.local.dir", "/dev/shm/graft/local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val staged = s"/dev/shm/graft/featbench_docs_$nDocs"
    if (!new java.io.File(staged).isDirectory) {
      DocsGen.docs(DocsGen.gen(spark, nDocs, seed = 42L))
        .toDF().repartition(cpus * 2).write.mode("overwrite").parquet(staged)
    }
    import spark.implicits._
    val docs = spark.read.parquet(staged).as[graft.core.Doc]
    val model = graft.detect.Features.fit(
      DocsGen.goldSentences(DocsGen.gen(spark, math.min(nDocs, 30000L), seed = 42L)))

    def time(tag: String, feats: Option[graft.detect.Features.FeatureModel], reps: Int): Seq[Double] =
      (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = KgPipeline.detectMentions(docs, DocsGen.vocabEntries, cpus * 2, feats).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[featbench] $tag run=$i mentions=$n sec=$sec%.2f")
        sec
      }

    // warm-up one rep of each, then interleave timed reps
    time("warm-gaz", None, 1); time("warm-feat", Some(model), 1)
    val gaz = scala.collection.mutable.ArrayBuffer.empty[Double]
    val feat = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to runs) {
      gaz ++= time("gaz-only", None, 1)
      feat ++= time("with-feats", Some(model), 1)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"""{"bench":"features","docs":$nDocs,"cpus":$cpus,"gaz_sec":${med(gaz.toSeq)}%.2f,"feat_sec":${med(feat.toSeq)}%.2f,"overhead":${med(feat.toSeq) / med(gaz.toSeq)}%.3f}""")
    spark.stop()
  }
}
