package graft.tools

import graft.data.{DocsGen, Lexicon}
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall breakdown of the kg_triples pipeline — where does the
  * headline query's time go (generation, detection, resolution, CC,
  * assembly, canonicalize)? Usage:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TriplesProfile"`
  */
object TriplesProfile {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val docs = DocsGen.docs(DocsGen.gen(spark, n, seed = 42L))
      val lex = Lexicon.fromSurfaces(DocsGen.vocabEntries.toDS())
      time("gen+count docs")(docs.count())
      val gaz = Lexicon.gazetteerEntries(lex)
      val mentions = KgPipeline.detectMentions(docs, gaz)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      time("detect+persist mentions")(mentions.count())
      val surfaces = mentions.select(col("text"), col("entity_type")).distinct()
        .as[(String, String)]
      val resolution = graft.link.Linker.surfaceResolution(surfaces, lex)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("resolution")(resolution.count())
      val linked = mentions
        .join(broadcast(resolution), Seq("text", "entity_type"), "inner")
        .select(col("doc_id"), col("span_idx"), col("entity_type"), col("text"),
          col("start"), col("end"), col("confidence"), col("concept_id"), col("link_score"))
        .as[graft.core.LinkedMention]
      val edges = resolution
        .select(concat(lit("S:"), col("text")).as("src"), col("concept_id").as("dst"))
        .distinct()
      val components = time("connected components")(graft.canon.Canon.connectedComponents(edges))
      val triples = graft.assemble.Triples.assemble(linked)
      time("assemble (count)")(triples.count())
      val canon = graft.assemble.Triples.canonicalize(triples, components)
      time("canonicalize+order (count)")(canon.toDF().orderBy("doc_id", "pred").count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
