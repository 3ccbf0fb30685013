package graft.tools

import graft.data.{DocsGen, Lexicon}
import graft.link.Linker
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-time profile of the KG pipeline (dev tool). */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 30000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs =
      if (args.length > 1 && args(1).startsWith("staged:"))
        spark.read.parquet(args(1).stripPrefix("staged:")).as[graft.core.Doc]
      else DocsGen.docs(DocsGen.gen(spark, n, seed = 42L))
    time("docs scan+count")(docs.count())
    val lex = time("lexicon")(Lexicon.fromSurfaces(DocsGen.vocabEntries.toDS()).cache())
    lex.count()

    // the stages of KgPipeline.runWithCleanup, timed individually — same
    // persists, same surface-level resolution path the pipeline executes
    val mentions = KgPipeline.detectMentions(docs, DocsGen.vocabEntries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    time("detect (persist)")(mentions.count())
    val surfaces = mentions.select(col("text"), col("entity_type")).distinct().as[(String, String)]
    val resolution = Linker.surfaceResolution(surfaces, lex)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("surface resolution")(resolution.count())
    val linked = mentions
      .join(broadcast(resolution), Seq("text", "entity_type"), "inner")
      .select(col("doc_id"), col("span_idx"), col("entity_type"), col("text"),
        col("start"), col("end"), col("confidence"), col("concept_id"), col("link_score"))
      .as[graft.core.LinkedMention]
      .persist()
    time("link (broadcast join)")(linked.count())
    val edges = resolution
      .select(concat(lit("S:"), col("text")).as("src"), col("concept_id").as("dst"))
      .distinct()
    val comp = time("cc (adaptive)")(graft.canon.Canon.connectedComponents(edges))
    val triples = graft.assemble.Triples.assemble(linked)
    time("assemble")(triples.count())
    val canonTriples = graft.assemble.Triples.canonicalize(triples, comp)
    time("canonicalize")(canonTriples.count())
    spark.catalog.clearCache()
    time("full KgPipeline.run (cold)")({
      val (t, cleanup) = KgPipeline.runWithCleanup(docs, lex)
      val n = t.count(); cleanup(); n
    })
    spark.stop()
  }
}
