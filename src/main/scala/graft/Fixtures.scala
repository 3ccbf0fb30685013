package graft

import graft.core.Hashing
import graft.data.DocsGen
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Oracle fixtures for the driver's DuckDB correctness gate.
  *
  * `stage` writes small parquet tables under `<outDir>/_fixtures/` that the
  * oracle SQL in [[SparkEntry.oracleSql]] reads via `read_parquet` (the
  * `{OUT}` placeholder is substituted with the real outDir by [[Verify]]).
  *
  * Two fixture families, by what the oracle then PROVES:
  *
  *  1. GOLD fixtures (`gold_*`, `vocab`) come from the deterministic
  *     generator [[DocsGen]], built in a plain driver-side loop — never
  *     through the pipeline under test. Oracle SQL over them re-derives the
  *     expected output of the KG/stats/sink operators independently
  *     (concept ids via SQL row_number, triples via SQL joins, sinks via
  *     SQL string building), so a detector/linker/canon/assembly bug shows
  *     up as a hard mismatch.
  *
  *  2. LOCAL-REFERENCE fixtures (`expected_*`) are brute-force, sequential
  *     re-implementations of the hash-based ops (minhash/LSH/simhash/
  *     langid/fingerprint/augmentation/multimodal) whose kernels DuckDB
  *     cannot express. They share only the pure scalar kernels with the
  *     production ops; all DISTRIBUTED machinery under test — banding
  *     joins, bucket caps, dedup, partial aggregation, partition-
  *     independent seeding — is re-derived here with naive local loops.
  */
object Fixtures {

  /** Synthetic docs-scale per sf dir: sf0.001→300, sf0.01→3000, sf0.1→30000. */
  def synthDocs(dir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    math.max((300000 * sf).toLong, 100L)
  }

  /** Synonym dictionary used by the augmentation query and its oracle. */
  val AugSynonyms: Map[String, IndexedSeq[String]] =
    Map("检查" -> IndexedSeq("查验", "检测"), "发现" -> IndexedSeq("查见"))

  /** The detector kernel's per-position confidence at a gazetteer match,
    * in CLOSED FORM — independent of the kernel code, so the driver
    * oracle catches a kernel regression instead of tracking it (the r2
    * version MEASURED this by running the kernel under test, making the
    * confidence column self-referential; r2 VERDICT next-step #1).
    *
    * The emission contract (SURVEY §2.3 K2): a gazetteer-matched position
    * scores {matched label: 8, O-prior: 2, other 11 labels: 0} over the
    * 13-label vocabulary. softmax at the matched label:
    *   1 / (1 + e^(2-8) + 11·e^(0-8))
    * Every position of a matched span gets the same value, so the
    * span-mean the mention carries equals it too. `KernelGoldenSpec`
    * asserts the running kernel agrees with this formula.
    */
  def kernelConfidence(): Double =
    1.0 / (1.0 + math.exp(-6.0) + 11.0 * math.exp(-8.0))

  /** Stage all fixtures; returns the placeholder substitutions for the
    * oracle SQL ({OUT} → outDir, {CONF} → kernel confidence literal).
    */
  def stage(spark: SparkSession, sfDir: String, outDir: String): Map[String, String] = {
    import spark.implicits._
    val fixDir = s"$outDir/_fixtures"
    def write(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$fixDir/$name.parquet")

    // ----------------------------------------------------------- gold docs
    val n = synthDocs(sfDir)
    val gold = (0L until n).map(i => DocsGen.buildDoc(i, seed = 42L))

    val sentences = gold.flatMap(_.sentences)
    write(gold.flatMap(_.mentions)
      .map(m => (m.doc_id, m.span_idx, m.entity_type, m.text, m.start, m.end))
      .toDF("doc_id", "span_idx", "entity_type", "text", "start", "end"), "gold_mentions")
    write(sentences
      .map(ts => (ts.doc_id, ts.span_idx, ts.chars.mkString, ts.chars.length))
      .toDF("doc_id", "span_idx", "text", "len"), "gold_sentences")
    write(sentences
      .flatMap(ts => ts.chars.indices.map(p => (ts.doc_id, ts.span_idx, p, ts.chars(p), ts.tags(p))))
      .toDF("doc_id", "span_idx", "pos", "ch", "tag"), "gold_tags")
    // ORACLE ASSUMPTION (pinned — r2 VERDICT next-step #7): the star-shaped
    // kg_components oracle models every component as ONE concept plus its
    // surfaces, which is valid iff no surface maps to two concepts (a
    // shared surface would MERGE two stars and the SQL oracle would be
    // wrong while still matching a wrong CC). Assert the generator
    // invariant at staging time so a vocab change cannot silently
    // invalidate the oracle; the genuinely-merged case is exercised in
    // sbt tests (Round3Spec: shared-surface CC merge vs union-find).
    locally {
      val shared = DocsGen.vocabEntries.groupBy(_._1).collect {
        case (surf, entries) if entries.map(_._2).distinct.size > 1 => surf
      }
      require(shared.isEmpty,
        s"kg_components oracle assumption violated: surfaces mapped to multiple concepts: $shared")
    }
    write(DocsGen.vocabEntries.toDF("surface", "entity_type"), "vocab")

    // ------------------- K2-full n-gram detection (local sequential)
    // Sequential replica of kg_mentions_ngram: fitLocal (bit-identical to
    // the distributed fit — both reduce to Features.fromCounts over exact
    // counts), then the SAME detector kernel run one sentence at a time
    // with the pruned gazetteer. Distributed machinery under test: the
    // flatMap→groupBy fit aggregation, the model broadcast, and the
    // repartitioned mapPartitions detector. Confidence is rounded with
    // SPARK's round at staging so both sides share one rounding kernel.
    locally {
      val model = graft.detect.Features.fitLocal(
        sentences.map(ts => (ts.chars, ts.tags)))
      val pruned = DocsGen.vocabEntries
        .filterNot { case (surf, _) => SparkEntry.ngramHeldOut(surf) }
      val kernel = new graft.detect.Detector.Kernel(
        graft.detect.Detector.Gazetteer(pruned), 128, feats = model)
      val rows = sentences.flatMap { ts =>
        kernel.detect(graft.core.Sentence(ts.doc_id, ts.span_idx, ts.chars.mkString))
      }.map(m => (m.doc_id, m.span_idx, m.entity_type, m.text, m.start, m.end, m.confidence))
      write(rows.toDF("doc_id", "span_idx", "entity_type", "text", "start", "end", "confraw")
        .withColumn("confidence", round($"confraw", 6)).drop("confraw"),
        "expected_ngram_mentions")
    }

    // ---------------------------- negative sampling (local sequential)
    // positives re-derived from gold mentions + the SQL lexicon's concept
    // assignment (row_number over (entity_type, surface), C%07d — same
    // total order as Lexicon.fromSurfaces), then the same draw kernel.
    // Distributed machinery under test: the broadcast candidate join, the
    // bounded explode, the codegen'd hash draw, and the anti-join filter
    // — all must equal this naive loop under any partitioning.
    locally {
      val conceptOf: Map[(String, String), String] = DocsGen.vocabEntries
        .sortBy { case (surf, tpe) => (tpe, surf) }.zipWithIndex
        .map { case ((surf, tpe), i) => (surf, tpe) -> f"C${i + 1}%07d" }.toMap
      val rules = Seq(
        ("Diseases", "Drug", "treated_by"), ("Diseases", "Laboratory", "has_finding"),
        ("Diseases", "Anatomical", "located_in"), ("Diseases", "Image", "diagnosed_by"),
        ("Diseases", "Operation", "treated_with"))
      val docConcepts: Map[String, Seq[(String, String)]] = gold.flatMap(_.mentions)
        .filter(_.doc_id < SparkEntry.NegativesDocCap) // training-split scope
        .map(m => (m.doc_id, m.entity_type, conceptOf((m.text, m.entity_type))))
        .distinct
        .groupBy(_._1)
        .map { case (d, xs) => d -> xs.map(x => (x._2, x._3)) }
      val positives: Seq[(String, String, String, String)] = docConcepts.values.flatMap { ms =>
        for {
          (st, sc) <- ms; (ot, oc) <- ms
          (rs, ro, pred) <- rules if st == rs && ot == ro
        } yield (sc, pred, oc, ot)
      }.toSeq.distinct
      val candsByType: Map[String, IndexedSeq[String]] = DocsGen.vocabEntries
        .map { case (surf, tpe) => tpe -> conceptOf((surf, tpe)) }
        .distinct
        .groupBy(_._1)
        .map { case (t, xs) => t -> xs.map(_._2).distinct.sorted.toIndexedSeq }
      val posSet = positives.map(p => (p._1, p._2, p._3)).toSet
      val negRows = positives.flatMap { case (s, p, o, ot) =>
        val cands = candsByType(ot)
        (0 until SparkEntry.NegativesK).flatMap { j =>
          val neg = cands(graft.graph.NegativeSampling.drawIndex(
            SparkEntry.NegativesSeed, s, p, o, j, cands.size))
          // the true-triple filter subsumes neg == o ((s, p, o) ∈ posSet)
          if (!posSet((s, p, neg))) Some((s, p, o, neg, j)) else None
        }
      }
      write(negRows.toDF("subj", "pred", "obj", "neg_obj", "attempt"), "expected_negatives")

      // -------------------------- random walks (local sequential)
      // replicates RandomWalks.walks over the UNscoped co-occurrence
      // graph: sorted capped adjacency + the same stepDraw kernel. The
      // distributed machinery under test: per-step broadcast joins, the
      // codegen'd hash draw, and partition-independent frontier unions.
      val coPairs: Set[(String, String)] = gold.flatMap(_.mentions)
        .map(m => (m.doc_id, conceptOf((m.text, m.entity_type))))
        .distinct
        .groupBy(_._1)
        .values
        .flatMap { ms =>
          val cs = ms.map(_._2).distinct
          for (a <- cs; b <- cs if a < b) yield (a, b)
        }.toSet
      val walkAdj: Map[String, IndexedSeq[String]] = coPairs.toSeq
        .flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).distinct.sorted.take(1024).toIndexedSeq }
      val walkRows: Seq[(String, Int, Int, String)] =
        walkAdj.keys.toSeq.sorted.flatMap { start =>
          (0 until SparkEntry.WalksPerNode).flatMap { w =>
            var cur = start
            (start, w, 0, start) +: (1 to SparkEntry.WalkLen).map { st =>
              val nbrs = walkAdj(cur)
              cur = nbrs(graft.graph.RandomWalks.stepDraw(
                SparkEntry.WalksSeed, start, w, st, cur, nbrs.size))
              (start, w, st, cur)
            }
          }
        }
      write(walkRows.toDF("start", "walk", "step", "node"), "expected_walks")
    }

    // ------------------------------------- augmentation (local sequential)
    // replicates augmentCorpus: originals ∪ (70%-gated augmentOne rows) —
    // the Spark op must produce the same multiset regardless of partitioning
    val augCounts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    sentences.foreach { ts =>
      ts.tags.foreach(t => augCounts(t) += 1)
      if (Hashing.uniformDouble(Hashing.hash2(42L, Hashing.hashString(ts.doc_id + "|gate"))) < 0.7) {
        graft.aug.Augment.augmentOne(ts, AugSynonyms, DocsGen.Vocab, 42L)
          .tags.foreach(t => augCounts(t) += 1)
      }
    }
    write(augCounts.toSeq.sortBy(_._1).toDF("tag", "n"), "expected_aug_tags")

    // ------------------------------------ multimodal decode (local, pure)
    val mediaRows = gold.flatMap { gd =>
      gd.doc.spans.zipWithIndex.collect {
        case (s, i) if s.kind != "text" =>
          val d = Multimodal.decodeItem(
            Multimodal.MediaItem(gd.doc.doc_id, i, s.kind, s.media_ref,
              Multimodal.payloadFor(s.kind, s.media_ref)))
          (gd.doc.doc_id, i, s.kind, s.media_ref, d.meta.width, d.meta.height,
            d.meta.sample_rate, d.meta.format, d.features(0).toDouble)
      }
    }
    write(mediaRows
      .toDF("doc_id", "span_idx", "kind", "media_ref", "width", "height", "sample_rate", "format", "f0raw")
      .withColumn("f0", round(col("f0raw"), 5)).drop("f0raw"), "expected_multimodal")

    // -------------------------------------- documents-table ops (local)
    val docs: Seq[(Long, String)] = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

    // stratified-sample replica: the same seeded per-id gate applied in a
    // local loop (distributed machinery under test: the partition-
    // independent filter — any partition-order dependence would diverge)
    locally {
      val docLangs: Seq[(Long, String)] = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"), col("lang"))
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
      val rates = Map("zh" -> 1.0, "en" -> 0.2) // must match q_docs_stratified_sample
      write(docLangs.collect {
        case (id, lang) if Hashing.uniformDouble(Hashing.hash2(0x5A3EL, id)) <
          rates.getOrElse(lang, 0.5) => id
      }.toDF("doc_id"), "expected_stratified_sample")
    }

    // mixture-gate replica: per-source rates re-derived with a local loop
    // (token totals via the same single-space split as the op), then the
    // seeded per-id gate. The RATE values are independently recomputed by
    // the oracle SQL in DuckDB; this fixture pins only the gate MEMBERSHIP
    // (the partition-independent draw DuckDB cannot express).
    locally {
      def sparkTrim(s: String): String = { // Spark trim strips ' ' only (not \t\n like String.trim)
        var b = 0; var e = s.length
        while (b < e && s.charAt(b) == ' ') b += 1
        while (e > b && s.charAt(e - 1) == ' ') e -= 1
        s.substring(b, e)
      }
      val srcDocs: Seq[(Long, String, String)] = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"), col("source"), col("text"))
        .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
      def toks(t: String): Long =
        if (t == null) 0L else sparkTrim(t).split(" ", -1).length.toLong
      val totals = srcDocs.groupBy(_._2).map { case (s, g) => s -> g.map(d => toks(d._3)).sum }
      val wts = SparkEntry.MixtureWeights.toMap
      val mixRates = totals.collect { case (s, t) if wts.contains(s) && t > 0L =>
        s -> math.min(1.0, SparkEntry.MixtureBudget * wts(s) / t)
      }
      write(srcDocs.collect { case (id, src, _) if
          Hashing.uniformDouble(Hashing.hash2(SparkEntry.MixtureSeed, id)) <
            mixRates.getOrElse(src, 0.0) => id
        }.toDF("doc_id"), "expected_mixture_sample")

      // HLL replica: same registers, built SEQUENTIALLY per source (the
      // distributed machinery under test is the map-side partial register
      // build + per-register-max merge — bit-identical results under any
      // partitioning is the sketch's mergeability claim)
      val hllRows = srcDocs
        .groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (src, g) =>
          val regs = graft.core.Hll.newRegisters(graft.core.Hll.DefaultP)
          g.sortBy(_._1).foreach { case (_, _, txt) =>
            if (txt != null)
              sparkTrim(txt).toLowerCase.split(" ", -1)
                .foreach(tok => if (tok.nonEmpty) graft.core.Hll.addString(regs, tok))
          }
          (src, graft.core.Hll.estimateLong(regs))
        }
      write(hllRows.toDF("source", "est_distinct"), "expected_hll")

      // weighted-sample replica: the same u^(1/w) draw and top-k taken
      // sequentially (distributed machinery under test: the per-partition
      // bounded top-k + driver merge must equal the global order)
      val docChars: Seq[(Long, Long)] = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
      val weighted = docChars.collect { case (id, nc) if nc > 0L =>
        (id, nc, math.pow(
          Hashing.uniformDouble(Hashing.hash2(SparkEntry.WeightedSeed, id)), 1.0 / nc))
      }.sortBy { case (id, _, key) => (-key, id) }.take(SparkEntry.WeightedK)
      write(weighted.toDF("doc_id", "n_chars", "samp_key"), "expected_weighted_sample")

      // Count-Min replica: same counters, built SEQUENTIALLY per source
      // (the add is commutative elementwise arithmetic, so the sequential
      // sketch must equal the distributed partial-agg + merge sketch
      // bit-for-bit — the mergeability claim under test). Probes are the
      // 5 globally most-frequent tokens, tie-broken by token, recomputed
      // here the same way the Spark query derives them.
      locally {
        def docToks(t: String): Seq[String] =
          if (t == null) Seq.empty
          else sparkTrim(t).toLowerCase.split(" ", -1).toSeq.filter(_.nonEmpty)
        val globalCounts = mutable.Map.empty[String, Long].withDefaultValue(0L)
        srcDocs.foreach { case (_, _, txt) => docToks(txt).foreach(t => globalCounts(t) += 1L) }
        val top5 = globalCounts.toSeq.sortBy { case (tok, n) => (-n, tok) }.take(5).map(_._1)
        val cmsRows = srcDocs.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (src, g) =>
          val cms = graft.core.CountMin.create(
            graft.core.CountMin.DefaultDepth, graft.core.CountMin.DefaultWidth)
          g.foreach { case (_, _, txt) =>
            docToks(txt).foreach(t => graft.core.CountMin.add(cms, Hashing.hashString(t)))
          }
          top5.sorted.map(tok =>
            (src, tok, graft.core.CountMin.estimate(cms, Hashing.hashString(tok))))
        }
        write(cmsRows.toDF("source", "token", "est_n"), "expected_cms")
      }

      // DDSketch replica: per-lang log-bucket histogram over n_chars,
      // built sequentially (elementwise-add merge ⇒ partition-independent
      // buckets; quantile estimates are StrictMath doubles shared with
      // the kernel, so equality is exact — no rounding in the contract)
      locally {
        val langChars: Seq[(String, Long)] = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("lang"), col("n_chars").cast("long"))
          .as[(String, Long)].collect().toSeq
        val alpha = graft.core.DdHist.DefaultAlpha
        val ddRows = langChars.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, g) =>
          val h = graft.core.DdHist.create(alpha)
          g.foreach { case (_, v) => graft.core.DdHist.add(h, alpha, v) }
          def q(p: Double) = graft.core.DdHist.quantile(h, alpha, p)
          (lang, q(0.25), q(0.5), q(0.75), q(0.95))
        }
        write(ddRows.toDF("lang", "est_p25", "est_p50", "est_p75", "est_p95"),
          "expected_ddsketch")
      }
    }

    // shuffle-shard replica: the bijective hash draw per id, sequentially
    // (distributed machinery under test: the narrow projection must agree
    // with this scalar kernel bit-for-bit under any partitioning)
    write(docs.map { case (id, _) => (id, Hashing.hash2(SparkEntry.ShardSeed, id)) }
      .toDF("doc_id", "h"), "expected_shuffle_hash")

    write(docs.map { case (id, t) => (id, Dedup.simhash(if (t == null) "" else t)) }
      .toDF("doc_id", "simhash"), "expected_simhash")
    write(docs.map { case (id, t) => (id, TextAnalysis.languageId(t)) }
      .toDF("doc_id", "lang_pred"), "expected_langid")

    // curation sample-gate replica: ids passing the seeded per-id gate at
    // their locally-predicted language's rate. Stages 1-3 of the funnel
    // (normalized dedup, language filter, quality threshold) are fully
    // SQL-derivable in the q_docs_curation oracle; the gate draw is not.
    write(docs.flatMap { case (id, t) =>
      val lang = TextAnalysis.languageId(if (t == null) "" else t)
      val rate = Map("en" -> 0.8, "zh" -> 1.0).getOrElse(lang, 0.6)
      if (Hashing.uniformDouble(Hashing.hash2(0xCA7EL, id)) < rate) Some(id) else None
    }.toDF("doc_id"), "expected_curation_gate")

    // simhash near-dup pairs replica: pigeonhole banding (4 bands × 16
    // bits), bucket cap, exact hamming verify — over docs ∪ planted copies
    val shCorpus = docs.map { case (id, t) => id -> Dedup.simhash(if (t == null) "" else t) } ++
      docs.filter(_._1 < 25).map { case (id, t) => (id + 100000L) -> Dedup.simhash(if (t == null) "" else t) }
    val shCand = mutable.Set.empty[(Long, Long)]
    for (b <- 0 until 4) {
      shCorpus.groupBy { case (_, h) => (h >>> (b * 16)) & 0xFFFFL }.values
        .filter(g => g.size >= 2 && g.size <= 1000)
        .foreach { g =>
          for (i <- g.indices; j <- (i + 1) until g.size) {
            val (x, y) = (g(i)._1, g(j)._1)
            shCand += (if (x < y) (x, y) else (y, x))
          }
        }
    }
    val shMap = shCorpus.toMap
    write(shCand.toSeq.sorted
      .map { case (x, y) => (x, y, java.lang.Long.bitCount(shMap(x) ^ shMap(y))) }
      .filter(_._3 <= 3)
      .toDF("id_a", "id_b", "hamming"), "expected_simhash_pairs")
    write(docs.map { case (id, t) => (id, TextAnalysis.fingerprint(if (t == null) "" else t)) }
      .toDF("doc_id", "fingerprint"), "expected_fingerprint")

    // minhash near-dup pairs: naive banding replica (group by raw band
    // slice instead of its hash; equal slices ⇔ equal buckets)
    val k = 64; val bands = 16; val rows = k / bands
    val sigs = docs.map { case (id, t) => id -> Dedup.minhashSignature(if (t == null) "" else t, k, 3) }
    val candidates = mutable.Set.empty[(Long, Long)]
    for (b <- 0 until bands) {
      sigs.groupBy(_._2.slice(b * rows, (b + 1) * rows).toSeq).values
        .filter(g => g.size >= 2 && g.size <= 200) // maxBucket replica
        .foreach { g =>
          for (i <- g.indices; j <- (i + 1) until g.size) {
            val (a, bb) = (g(i)._1, g(j)._1)
            candidates += (if (a < bb) (a, bb) else (bb, a))
          }
        }
    }
    val sigMap = sigs.toMap
    val minhashPairs = candidates.toSeq.sorted.flatMap { case (a, b) =>
      val (sa, sb) = (sigMap(a), sigMap(b))
      val eq = sa.zip(sb).count { case (x, y) => x == y }
      val est = eq.toDouble / k
      if (est >= 0.3) Some((a, b, est)) else None
    }
    write(minhashPairs.toDF("id_a", "id_b", "est_raw")
      .withColumn("est_jaccard", round(col("est_raw"), 6)).drop("est_raw"), "expected_minhash_pairs")

    // near-dup CLUSTER replica: union-find over the same pair set — the
    // distributed machinery under test in `dedup_minhash_clusters` is the
    // connected-components contraction over the banded pair graph
    locally {
      val parent = mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      minhashPairs.foreach { case (a, b, _) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val members = minhashPairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      write(members.map(m => (m, find(m))).toDF("id", "keep_id"), "expected_neardup_clusters")
    }

    // ------------------------------------------- embedding ops (local)
    val embeddings: Seq[(Long, Array[Float])] = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)

    def dot(x: Array[Float], y: Array[Float]): Double = {
      // same left-fold shape as the Catalyst aggregate(zip_with(...)) path
      var acc = 0.0; var i = 0; val m = math.min(x.length, y.length)
      while (i < m) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
      acc
    }
    def cosine(x: Array[Float], y: Array[Float]): Double =
      dot(x, y) / math.max(math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)), 1e-12)

    // near-dup corpus = embeddings ∪ planted perturbed copies (replicating
    // the dedup_embedding_neardup query's planting)
    val planted = embeddings.filter(_._1 < 50).map { case (id, v) =>
      (id + 100000L, v.zipWithIndex.map { case (x, i) =>
        x + (Hashing.uniformDouble(Hashing.hash2(id, i)) * 0.02 - 0.01).toFloat
      })
    }
    val ndCorpus = embeddings ++ planted
    val ndPlanes = Similarity.planeVectors(0xB17, 32, 64)
    val ndBands = ndCorpus.map { case (id, v) => id -> Similarity.signBands(v, ndPlanes, 4) }
    val ndCand = mutable.Set.empty[(Long, Long)]
    for (b <- 0 until 4) {
      ndBands.groupBy(_._2(b)).values
        .filter(g => g.size >= 2 && g.size <= 1000) // maxBucket replica
        .foreach { g =>
          for (i <- g.indices; j <- (i + 1) until g.size) {
            val (a, bb) = (g(i)._1, g(j)._1)
            ndCand += (if (a < bb) (a, bb) else (bb, a))
          }
        }
    }
    val ndMap = ndCorpus.toMap
    write(ndCand.toSeq.sorted.map { case (a, b) => (a, b, cosine(ndMap(a), ndMap(b))) }
      .toDF("id_a", "id_b", "cos_raw")
      .withColumn("cosine", round(col("cos_raw"), 6)).drop("cos_raw")
      .filter(col("cosine") >= 0.98), "expected_neardup")

    // ANN LSH top-k replica: queries = vec_id < 10 over the raw embeddings
    val nb = Similarity.AnnBands
    val annPlanes = Similarity.planeVectors(0xA55, Similarity.AnnPlanes, 64)
    val annBands = embeddings.map { case (id, v) => id -> Similarity.signBands(v, annPlanes, nb) }
    val bucketOk: Map[(Int, Long), Boolean] = (for (b <- 0 until nb)
      yield annBands.groupBy(_._2(b)).map { case (key, g) => (b, key) -> (g.size <= Similarity.AnnMaxBucket) }
    ).flatten.toMap
    val annRows = embeddings.filter(_._1 < 10).flatMap { case (qid, qv) =>
      val qb = Similarity.signBands(qv, annPlanes, nb)
      val cand = annBands.filter { case (nid, nbv) =>
        nid != qid && (0 until nb).exists(b => nbv(b) == qb(b) && bucketOk((b, nbv(b))))
      }.map(_._1).distinct
      cand.map(nid => (qid, nid, cosine(qv, ndMap(nid))))
        .sortBy { case (_, nid, cos) => (-cos, nid) }
        .take(5).zipWithIndex
        .map { case ((q, nid, cos), idx) => (q, nid, cos, idx + 1) }
    }
    write(annRows.toDF("query_id", "neighbor_id", "cos_raw", "rank")
      .withColumn("cosine", round(col("cos_raw"), 6))
      .select("query_id", "neighbor_id", "cosine", "rank"), "expected_ann_lsh")

    // IVF top-k replica: deterministic TRAINED codebook (same k-means
    // kernel over the same sorted sample — the distributed machinery
    // replicated here is the sample top-k sort and the cell equi-join,
    // replaced by a naive candidate scan)
    val ivfSample = embeddings.sortBy { case (id, _) => (Hashing.mix64(id), id) }.take(4096)
    val cents = Similarity.kmeansCodebook(ivfSample, 16, 8)
    val cellOf = embeddings.map { case (id, v) => id -> Similarity.nearestCentroids(v, cents, 1)(0) }.toMap
    val ivfRows = embeddings.filter(_._1 < 10).flatMap { case (qid, qv) =>
      val probes = Similarity.nearestCentroids(qv, cents, 12).toSet
      embeddings
        .collect { case (nid, _) if nid != qid && probes(cellOf(nid)) => (qid, nid, cosine(qv, ndMap(nid))) }
        .sortBy { case (_, nid, cos) => (-cos, nid) }
        .take(5).zipWithIndex
        .map { case ((q, nid, cos), idx) => (q, nid, cos, idx + 1) }
    }
    write(ivfRows.toDF("query_id", "neighbor_id", "cos_raw", "rank")
      .withColumn("cosine", round(col("cos_raw"), 6))
      .select("query_id", "neighbor_id", "cosine", "rank"), "expected_ann_ivf")

    Map("{OUT}" -> outDir, "{CONF}" -> kernelConfidence().toString)
  }
}
