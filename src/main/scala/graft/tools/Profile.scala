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
    val mentions = KgPipeline.detectMentions(docs, DocsGen.vocabEntries)
    time("detect")(mentions.count())
    val mentionsC = mentions.persist()
    time("detect(persist)")(mentionsC.count())
    val linked = Linker.link(mentionsC, lex)
    time("link")(linked.count())
    val linkedC = linked.persist()
    time("link(persist)")(linkedC.count())
    val edges = linkedC.select(concat(lit("S:"), col("text")).as("src"), col("concept_id").as("dst")).distinct()
    val comp = time("cc")(graft.canon.Canon.connectedComponents(edges))
    time("cc count")(comp.count())
    val triples = graft.assemble.Triples.assemble(linkedC)
    time("assemble")(triples.count())
    val canonTriples = graft.assemble.Triples.canonicalize(triples, comp)
    time("canonicalize")(canonTriples.count())
    time("full KgPipeline.run")(KgPipeline.run(docs, lex).count())
    spark.stop()
  }
}
