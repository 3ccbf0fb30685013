package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B timing of the r5 (count-join-selfjoin) vs r6
  * (posting-list) banding pair generators — the old implementations are
  * inlined here verbatim so both run in ONE JVM in alternating reps,
  * canceling host-noise windows that plague absolute wall comparisons.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DedupAB [reps]"
  */
object DedupAB {

  private def oldMinhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 200): DataFrame = {
    def sigExpr(c: org.apache.spark.sql.Column) =
      graft.functions.MinHashSig.minhash_sig(coalesce(c, lit("")), k, shingleWidth)
    val sigs = df.select(col(idCol).as("id"), sigExpr(col(textCol)).as("sig"))
    val rows = k / bands
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b)))
        .as(Seq("band", "bucket")))
    val bucketSizes = banded.groupBy("band", "bucket").agg(count(lit(1)).as("bn"))
    val pruned = banded.join(bucketSizes.filter(col("bn") <= maxBucket), Seq("band", "bucket"))
    val a = pruned.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = pruned.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn(
        "est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0),
          (acc, x) => acc + x) / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  private def oldNgramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      w: Int = 3, threshold: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"),
        explode(graft.functions.ShingleHashes.shingle_hashes(
          coalesce(col(textCol), lit("")), w)).as("shingle"))
    val sizes = exploded.groupBy("id").agg(count(lit(1)).as("sz"))
    val dfilter = exploded
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val idx = exploded.join(dfilter.select("shingle"), Seq("shingle"))
    val inter = idx
      .join(idx.withColumnRenamed("id", "id_b"), Seq("shingle"))
      .filter(col("id") < col("id_b"))
      .groupBy(col("id").as("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "minhash_old" -> (() => oldMinhashPairs(docs, "text", "doc_id", threshold = 0.3)),
      "minhash_new" -> (() => Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.3)),
      "ngram_old" -> (() => oldNgramJaccardPairs(docs, "text", "doc_id", threshold = 0.3)),
      "ngram_new" -> (() => Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.3)))

    // warm-up (JIT + codegen for every variant)
    variants.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }

    val walls = scala.collection.mutable.LinkedHashMap(variants.map(_._1 -> Vector.empty[Double]): _*)
    for (r <- 0 until reps; (name, f) <- variants) {
      spark.sparkContext.setJobDescription(s"$name rep $r")
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      walls(name) = walls(name) :+ (System.nanoTime() - t0) / 1e9
    }
    walls.foreach { case (name, ts) =>
      val med = ts.sorted.apply(ts.length / 2)
      println(f"[ab] $name%-12s median $med%6.3f s  min ${ts.min}%6.3f  raw ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
