package graft

import graft.core.Hashing
import graft.ops.{Export, Mixture, TfIdf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the training-export operator family: token-budget mixture
  * sampling, deterministic shuffle-sharding, and tf-idf keyword profiles.
  */
class TrainingExportSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def docsDf = {
    import spark.implicits._
    // 3 sources, token counts chosen so web saturates its budget share
    // and books/code get fractional rates
    (0L until 300L).map { i =>
      val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code"
      (i, src, Seq.fill(4)(s"t${i % 7}").mkString(" ")) // 4 tokens per doc
    }.toDF("doc_id", "source", "text")
  }

  test("mixture: derived rates saturate small sources and hit the budget share") {
    val withTok = docsDf.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
    // each source has 100 docs * 4 tokens = 400 tokens
    val rates = Mixture.derivedRates(withTok, "source",
      Map("web" -> 0.6, "books" -> 0.3, "code" -> 0.1), tokenBudget = 800L)
    // web: min(1, 800*0.6/400) = 1.0 (saturates); books: 0.6; code: 0.2
    assert(rates("web") == 1.0)
    assert(math.abs(rates("books") - 0.6) < 1e-12)
    assert(math.abs(rates("code") - 0.2) < 1e-12)
    assert(rates.size == 3)
  }

  test("mixture: sample matches the sequential gate replica and ignores partitioning") {
    val weights = Map("web" -> 0.6, "books" -> 0.3, "code" -> 0.1)
    val seed = 0xABCL
    val got = Mixture.sampleToBudget(docsDf, "doc_id", "source", "text",
      weights, tokenBudget = 800L, seed)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // sequential replica: the same rate math + seeded gate in a loop
    val rate = Map("web" -> 1.0, "books" -> 0.6, "code" -> 0.2)
    val expect = (0L until 300L).flatMap { i =>
      val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code"
      if (Hashing.uniformDouble(Hashing.hash2(seed, i)) < rate(src))
        Some((i, src, 4L, rate(src))) else None
    }
    assert(got.toSeq == expect)
    // a source absent from the weights is excluded entirely
    val noCode = Mixture.sampleToBudget(docsDf, "doc_id", "source", "text",
      Map("web" -> 1.0), 800L, seed).select("source").distinct().collect().map(_.getString(0))
    assert(noCode.toSeq == Seq("web"))
    // partition-independence: same sample under a different layout
    val re = Mixture.sampleToBudget(docsDf.repartition(7, col("source")),
      "doc_id", "source", "text", weights, 800L, seed)
      .collect().map(_.getLong(0)).sorted
    assert(re.toSeq == got.map(_._1).toSeq)
  }

  test("shuffleShard: bijective sort keys, pinned shards, seed-independent orders") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("doc_id")
    val out = Export.shuffleShard(ids, "doc_id", numShards = 8, seed = 0x5EEDL)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    // sort_key is the scalar hash2 kernel bit-for-bit; shard = pmod(key, 8)
    out.foreach { case (id, key, shard) =>
      assert(key == Hashing.hash2(0x5EEDL, id))
      assert(shard == (((key % 8) + 8) % 8).toInt)
    }
    // bijective: 1000 distinct ids -> 1000 distinct keys
    assert(out.map(_._2).distinct.length == 1000)
    // every shard populated and roughly balanced (uniform hash: 125 +- wide slack)
    val perShard = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(perShard.keySet == (0 until 8).toSet)
    assert(perShard.values.forall(n => n > 60 && n < 190), s"skewed: $perShard")
    // a different seed is an independent permutation
    val out2 = Export.shuffleShard(ids, "doc_id", 8, seed = 0xFEEDL)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out2.map(_._2).toSeq != out.map(_._2).toSeq)
  }

  test("writeShards: each shard directory reads back in sort_key order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Export.writeShards((0L until 500L).toDF("doc_id"), "doc_id", dir, numShards = 4, seed = 7L)
    val all = scala.collection.mutable.Set.empty[Long]
    (0 until 4).foreach { s =>
      val rows = spark.read.parquet(s"$dir/shard=$s")
        .select("doc_id", "sort_key").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.nonEmpty)
      // within-file order is the within-shard sort order
      assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
      rows.foreach { case (id, _) => all += id }
    }
    assert(all == (0L until 500L).toSet) // a shuffle is a partition, not a sample
  }

  test("weightedTopK: matches the sequential replica, excludes w<=0, biases to weight") {
    import graft.ops.Sampling
    import spark.implicits._
    val rows = (0L until 2000L).map(i => (i, (i % 97) + 1L))
    val df = rows.toDF("doc_id", "w")
    val q = Sampling.weightedTopK(df, "doc_id", "w", 50, 0xABCDL)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val expect = rows
      .map { case (id, w) =>
        (id, w, math.pow(Hashing.uniformDouble(Hashing.hash2(0xABCDL, id)), 1.0 / w))
      }
      .sortBy { case (id, _, key) => (-key, id) }.take(50).sortBy(_._1)
    assert(got.toSeq == expect)
    // bounded top-k plan: per-partition TakeOrdered, no global sort exchange
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // partition-independent
    val re = Sampling.weightedTopK(df.repartition(7), "doc_id", "w", 50, 0xABCDL)
      .collect().map(_.getLong(0)).sorted
    assert(re.toSeq == got.map(_._1).toSeq)
    // non-positive weights are excluded entirely
    val withZero = (rows :+ (9999L, 0L) :+ (9998L, -5L)).toDF("doc_id", "w")
    val ids = Sampling.weightedTopK(withZero, "doc_id", "w", 2050, 0xABCDL)
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9999L) && !ids.contains(9998L) && ids.size == 2000)
    // weight-proportional bias: the sample's mean weight far exceeds the corpus mean
    val sampleMeanW = got.map(_._2).sum.toDouble / got.length // corpus mean = 49
    assert(sampleMeanW > 60.0, s"mean=$sampleMeanW")
  }

  test("tfidf: scores and ranks match a brute-force replica on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a", "x x y common"),
      (1L, "a", "x z common"),
      (2L, "b", "y y z common"),
      (3L, "b", "w common")).toDF("doc_id", "source", "text")
    val got = TfIdf.topTermsPerSource(docs, "doc_id", "source", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
      .sortBy(t => (t._1, t._6))
    // N=4. df: x=2 y=2 z=2 w=1 common=4.
    // source a tf: x=3 z=1 y=1 common=2 -> scores: x=3*4/2=6, common=2, z=2, y=2
    //   top2: x(6), then tie on 2.0 broken token-asc -> common
    // source b tf: y=2 z=1 w=1 common=2 -> scores: y=4, w=4, common=2, z=2
    //   top2: tie on 4.0 -> w before y? no: token asc -> w(4) rank1, y(4) rank2
    val expect = Seq(
      ("a", "x", 3L, 2L, 6.0, 1), ("a", "common", 2L, 4L, 2.0, 2),
      ("b", "w", 1L, 1L, 4.0, 1), ("b", "y", 2L, 2L, 4.0, 2))
    assert(got.toSeq == expect)
  }
}
