package graft.detect

import graft.core.{Bio, Mention, Sentence}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** The batched mention detector — the Spark re-architecture of the
  * reference's sequence-model kernel (`bert_crf_model.py:61-116`,
  * batch loop `predict_enhanced.py:341-353`).
  *
  * Architecture (SURVEY.md §2.3): a typed `Dataset[Sentence]` flows through
  * ONE `mapPartitions` that (a) groups rows into batches exactly like the
  * reference's `texts[i:i+batch_size]` slices, (b) tokenizes per character
  * (Chinese clinical text is char-level in the reference, `utils.py:56-84`),
  * (c) computes per-position per-label emission scores from broadcast
  * gazetteer features (replacing the BERT forward pass — same output
  * contract: seq_len × num_labels floats), (d) runs a BIO-constrained
  * Viterbi decode (the `crf.decode` analog, `bert_crf_model.py:112-116`),
  * and (e) converts tags to mentions with `Bio.decodeBio`
  * (`predict_enhanced.py:282-326`).
  *
  * Everything the task needs is broadcast once (gazetteer + transition
  * matrix); the map is pure, so the operator scales linearly with input
  * partitions and never shuffles.
  */
object Detector {

  val NumLabels: Int = Bio.Labels.length
  private val labelArr: Array[String] = Bio.Labels.toArray
  private val oId: Int = Bio.OId
  private val bId: Map[String, Int] =
    Bio.EntityTypes.map(t => t -> Bio.LabelToId("B-" + t)).toMap
  private val iId: Map[String, Int] =
    Bio.EntityTypes.map(t => t -> Bio.LabelToId("I-" + t)).toMap
  // label ids by EntityTypes index — the trie's packed-match currency
  private val bIdByIdx: Array[Int] =
    Bio.EntityTypes.map(t => Bio.LabelToId("B-" + t)).toArray
  private val iIdByIdx: Array[Int] =
    Bio.EntityTypes.map(t => Bio.LabelToId("I-" + t)).toArray

  /** BIO-constraint transition matrix (the analog of trained CRF
    * transitions, `bert_crf_model.py:93-116`): 0 for legal transitions,
    * -1e9 for structurally invalid ones (O→I-X, B-X→I-Y, I-X→I-Y,
    * start→I-X). Static because the label grammar, not the data, defines
    * legality; emission scores carry all data signal. For the
    * data-dependent variant see [[estimateTransitions]].
    */
  val transitions: Array[Array[Float]] = {
    val t = Array.fill(NumLabels + 1, NumLabels)(0f) // row NumLabels = start
    val neg = -1e9f
    for (j <- 0 until NumLabels) {
      val to = labelArr(j)
      if (to.startsWith("I-")) {
        val tpe = to.substring(2)
        for (i <- 0 until NumLabels) {
          val from = labelArr(i)
          val ok = (from == "B-" + tpe) || (from == "I-" + tpe)
          if (!ok) t(i)(j) = neg
        }
        t(NumLabels)(j) = neg // can't start with I-
      }
    }
    t
  }

  /** K3 full: CORPUS-ESTIMATED CRF transitions — the supervised-training
    * analog of the reference's CRF layer (`bert_crf_model.py:93-111`;
    * gradient training of the encoder stays out of scope, SURVEY §2.3).
    *
    * Tag-bigram counts are computed DISTRIBUTED (flatMap → groupBy →
    * count; the aggregate is bounded by (L+1)×L = 182 rows, so the
    * collect is constant-size regardless of corpus scale) and converted
    * to add-k-smoothed log-probabilities per source row. Structurally
    * ILLEGAL transitions keep -1e9 regardless of the data — the BIO
    * grammar outranks observed counts exactly as torchcrf's masked decode
    * does; a malformed gold corpus therefore cannot teach the decoder to
    * emit ungrammatical paths.
    *
    * Drop-in: pass the result as the `trans` parameter of [[detect]] /
    * [[viterbi]] / [[Kernel]]. Row `NumLabels` is the start distribution.
    */
  /** Distributed tag-bigram counts in label-id space (row `NumLabels` =
    * sentence start). The aggregate is bounded by (L+1)×L = 182 keys, so
    * the collect is constant-size regardless of corpus scale.
    */
  def transitionCounts(
      corpus: Dataset[graft.core.TaggedSentence]): Map[(Int, Int), Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .flatMap { ts =>
        val ids = ts.tags.map(t => Bio.LabelToId.getOrElse(t, oId))
        val start = if (ids.nonEmpty) Seq((NumLabels, ids.head)) else Nil
        start ++ ids.sliding(2).collect { case Seq(a, b) => (a, b) }
      }
      .toDF("from", "to")
      .groupBy("from", "to")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(Int, Int, Long)]
      .collect()
      .map { case (f, t, n) => (f, t) -> n }
      .toMap
  }

  def estimateTransitions(
      corpus: Dataset[graft.core.TaggedSentence],
      smoothing: Double = 1.0): Array[Array[Float]] = {
    val counts = transitionCounts(corpus)
    val out = Array.fill(NumLabels + 1, NumLabels)(0f)
    var i = 0
    while (i <= NumLabels) {
      val legal = (0 until NumLabels).filter(j => transitions(i)(j) > -1e8f)
      val total =
        legal.map(j => counts.getOrElse((i, j), 0L)).sum.toDouble + smoothing * legal.size
      var j = 0
      while (j < NumLabels) {
        out(i)(j) =
          if (transitions(i)(j) <= -1e8f) -1e9f
          else math.log((counts.getOrElse((i, j), 0L) + smoothing) / total).toFloat
        j += 1
      }
      i += 1
    }
    out
  }

  /** Gazetteer: longest-match dictionary features. `surfaces` maps a
    * surface form to its entity type; `maxLen` bounds the match scan.
    */
  case class Gazetteer(surfaces: Map[String, String], maxLen: Int)
      extends Serializable

  object Gazetteer {
    def apply(entries: Iterable[(String, String)]): Gazetteer = {
      val m = entries.toMap
      val maxLen = if (m.isEmpty) 1 else m.keysIterator.map(_.length).max
      Gazetteer(m, math.min(maxLen, 32))
    }
  }

  /** Character trie over gazetteer surfaces: longest-match lookup with
    * ZERO allocation per probe (no substring candidates). Built once per
    * executor JVM per broadcast ([[trieFor]]) and SHARED across that
    * JVM's tasks — so the probe is stateless: the match is returned
    * packed (`len << 32 | typeIdx`) instead of through a mutable field
    * (a shared `var lastType` was a cross-task data race).
    */
  final class GazTrie private (root: GazTrie.Node) extends Serializable {
    /** Longest surface matching text at `from` (within [from, limit)),
      * packed as `(matchLen.toLong << 32) | entityTypeIdx`; 0 if none.
      * `entityTypeIdx` indexes [[Bio.EntityTypes]].
      */
    def longestMatch(text: String, from: Int, limit: Int): Long = {
      var node = root
      var i = from
      var best = 0L
      while (i < limit && node != null) {
        node = node.child(text.charAt(i))
        i += 1
        if (node != null && node.typeIdx >= 0) {
          best = ((i - from).toLong << 32) | node.typeIdx.toLong
        }
      }
      best
    }
  }

  object GazTrie {
    /** Tries built in this JVM — observability hook for the executor-memo
      * tests (a broadcast gazetteer must be trie-ified once per executor
      * JVM, not once per task).
      */
    val builds = new java.util.concurrent.atomic.AtomicLong(0L)

    final class Node extends Serializable {
      /** Index into [[Bio.EntityTypes]]; -1 = not a surface end. */
      var typeIdx: Int = -1
      // open-addressed char→node map; tiny fan-out in practice
      private var keys: Array[Char] = new Array[Char](0)
      private var vals: Array[Node] = new Array[Node](0)
      def child(c: Char): Node = {
        var i = 0
        while (i < keys.length) { if (keys(i) == c) return vals(i); i += 1 }
        null
      }
      def getOrAdd(c: Char): Node = {
        val existing = child(c)
        if (existing != null) return existing
        val n = new Node
        keys = keys :+ c
        vals = vals :+ n
        n
      }
    }
    def apply(gaz: Gazetteer): GazTrie = {
      builds.incrementAndGet()
      val typeIdxOf = Bio.EntityTypes.zipWithIndex.toMap
      val root = new Node
      gaz.surfaces.foreach { case (surface, tpe) =>
        var node = root
        var i = 0
        while (i < surface.length) { node = node.getOrAdd(surface.charAt(i)); i += 1 }
        node.typeIdx = typeIdxOf(tpe)
      }
      new GazTrie(root)
    }
  }

  /** Per-executor-JVM GazTrie memo (the SignBands plane-memo pattern, r4
    * VERDICT "What's wrong" #2): at a UMLS-scale gazetteer (~10M
    * surfaces) the trie is hundreds of MB and O(total chars) to build —
    * rebuilding it per TASK multiplies that by every task on the
    * executor, while this cache pays it once per JVM per broadcast.
    *
    * Keyed by (application id, broadcast id): the broadcast id alone is
    * UNSAFE across SparkContext restarts in one JVM (its counter resets,
    * so a recycled id would serve a stale trie from the previous
    * context's gazetteer) — the app id disambiguates contexts. Keying by
    * the broadcast VALUE's identity instead would tie the memo to block-
    * manager residency: every eviction/re-materialization of the (large,
    * eviction-prone) deserialized block would rebuild the trie. Bounded
    * LRU so long sessions broadcasting many gazetteers cannot leak.
    */
  private val TrieCacheMax = 4
  // SoftReference values (ADVICE r5, low): at UMLS scale a trie is
  // hundreds of MB, and a hard-referenced LRU of 4 could pin over a GB
  // of DEAD tries for the JVM lifetime after their gazetteers are
  // unpersisted — soft refs let the GC reclaim them under pressure while
  // keeping the memo warm in the steady state.
  private val trieCache =
    new java.util.LinkedHashMap[(String, Long), java.lang.ref.SoftReference[GazTrie]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), java.lang.ref.SoftReference[GazTrie]]): Boolean =
        size() > TrieCacheMax
    }
  // per-key build serialization (ADVICE r5, low): ONE O(total-chars)
  // build per key per JVM (a lock-free computeIfAbsent ran the builder
  // 4x for 16 tasks), WITHOUT the former coarse lock that made a miss on
  // one gazetteer block every task needing a different, already-cached
  // one for the whole build.
  private val trieBuildLocks =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), AnyRef]()

  def trieFor(gazBc: Broadcast[Gazetteer]): GazTrie = {
    val appId =
      Option(org.apache.spark.SparkEnv.get).map(_.conf.getAppId).getOrElse("")
    val key = (appId, gazBc.id)
    def cached(): GazTrie = trieCache.synchronized {
      val ref = trieCache.get(key)
      if (ref == null) null else ref.get()
    }
    val hit = cached()
    if (hit != null) return hit
    val lock = trieBuildLocks.computeIfAbsent(key, _ => new Object)
    try lock.synchronized {
      // re-check under the per-key lock: the thread that lost the race
      // finds the winner's trie instead of rebuilding
      val again = cached()
      if (again != null) again
      else {
        val t = GazTrie(gazBc.value)
        trieCache.synchronized {
          trieCache.put(key, new java.lang.ref.SoftReference(t))
        }
        t
      }
    } finally trieBuildLocks.remove(key, lock)
  }

  /** Per-task detector kernel with REUSABLE buffers: the hot path
    * allocates only the emitted Mention objects. One instance per
    * partition (mapPartitions), shared across that task's batches —
    * exactly the "codec initialized once per batch" shape of the
    * reference's batch loop, minus the per-sentence array churn that
    * caps single-JVM scaling at high core counts (allocation-rate bound).
    */
  final class Kernel(
      gaz: Gazetteer,
      maxLen: Int,
      trans: Array[Array[Float]] = transitions,
      feats: Features.FeatureModel = null,
      sharedTrie: GazTrie = null) {
    private val trie = if (sharedTrie != null) sharedTrie else GazTrie(gaz)
    private val L = NumLabels
    private val em = Array.ofDim[Float](maxLen, L)
    private val featScratch = new Array[Double](L)
    private val dp = Array.ofDim[Float](maxLen, L)
    private val bp = Array.ofDim[Int](maxLen, L)
    private val path = new Array[Int](maxLen)
    private val conf = new Array[Double](maxLen)
    private val sb = new StringBuilder
    // Viterbi legal-predecessor lists (r6): for each target label j, the
    // ascending list of predecessors k the BIO grammar permits
    // (trans(k)(j) > -1e8). The inner max over the full L is replaced by
    // a max over this list — with the 13-label grammar that is 2 preds
    // for the six I- labels instead of 13 (~40% fewer dp ops). EXACT:
    // every label has >= 1 legal predecessor whose dp is finite (B-/O
    // are reachable from anywhere), while an illegal candidate scores
    // dp + (-1e9) — at least ~1e8 below any legal score (|dp| and |em|
    // are bounded by maxLen·max|weight| << 1e8) — so the restricted
    // argmax equals the full argmax, including first-wins tie order
    // (the list preserves ascending k).
    private val legalPred: Array[Array[Int]] = Array.tabulate(L) { j =>
      val ks = (0 until L).filter(k => trans(k)(j) > -1e8f)
      if (ks.isEmpty) (0 until L).toArray else ks.toArray
    }
    // bit-identical exp memo: the emission patterns when feats == null
    // take a handful of distinct values per corpus ({0, 2, 8} stamps),
    // so softmax recomputes exp() of the same float arguments millions
    // of times; a tiny open-addressed float->double cache returns the
    // EXACT same doubles (same exp of same argument), never changing a
    // confidence bit. NaN sentinel keys: a miss just recomputes.
    private val expKeys = Array.fill(64)(Float.NaN)
    private val expVals = new Array[Double](64)
    private def expCached(x: Float): Double = {
      val slot = (java.lang.Float.floatToRawIntBits(x) * 0x9E3779B9) >>> 26
      if (expKeys(slot) == x) expVals(slot)
      else {
        val v = math.exp(x.toDouble)
        expKeys(slot) = x
        expVals(slot) = v
        v
      }
    }

    def detect(s: Sentence): Seq[Mention] = detectWith(s, gaz, trie)

    /** [[detect]] against a CALLER-SUPPLIED gazetteer/trie, reusing this
      * kernel's scratch buffers — the per-sentence mini-gazetteer path
      * ([[detectPartitionedGazetteer]]) swaps tiny tries per sentence
      * without re-allocating the maxLen×L matrices each time.
      */
    def detectWith(s: Sentence, g: Gazetteer, t: GazTrie): Seq[Mention] = {
      val text = s.text
      val n = math.min(text.length, maxLen)
      if (n == 0) return Nil

      // emissions (K2): O prior + greedy longest trie matches
      var i = 0
      while (i < n) {
        java.util.Arrays.fill(em(i), 0f)
        em(i)(oId) = 2.0f
        i += 1
      }
      i = 0
      while (i < n) {
        // bound the trie scan by g.maxLen so this kernel and the
        // map-probe kernel (emissions()) agree on surfaces longer than the
        // gazetteer cap (they must stay interchangeable)
        val packed = t.longestMatch(text, i, math.min(i + g.maxLen, n))
        if (packed != 0L) {
          val m = (packed >>> 32).toInt
          val t = (packed & 0xFFFFFFFFL).toInt
          em(i)(bIdByIdx(t)) = 8.0f
          var k = 1
          while (k < m) { em(i + k)(iIdByIdx(t)) = 8.0f; k += 1 }
          i += m
        } else i += 1
      }
      // K2 full: hashed char n-gram + context-window features (additive
      // log-softmax per position — see Features scaladoc for the
      // calibration against the gazetteer stamps)
      if (feats != null) {
        i = 0
        while (i < n) { feats.addScores(text, i, n, em(i), featScratch); i += 1 }
      }

      // Viterbi (K4) into reusable dp/bp
      var j = 0
      while (j < L) { dp(0)(j) = trans(L)(j) + em(0)(j); j += 1 }
      i = 1
      while (i < n) {
        j = 0
        while (j < L) {
          val preds = legalPred(j)
          var best = Float.NegativeInfinity
          var arg = 0
          var p = 0
          while (p < preds.length) {
            val k = preds(p)
            val sc = dp(i - 1)(k) + trans(k)(j)
            if (sc > best) { best = sc; arg = k }
            p += 1
          }
          dp(i)(j) = best + em(i)(j)
          bp(i)(j) = arg
          j += 1
        }
        i += 1
      }
      var best = Float.NegativeInfinity
      var arg = 0
      j = 0
      while (j < L) { if (dp(n - 1)(j) > best) { best = dp(n - 1)(j); arg = j }; j += 1 }
      path(n - 1) = arg
      i = n - 1
      while (i > 0) { path(i - 1) = bp(i)(path(i)); i -= 1 }

      // per-position confidence (P7): softmax(emission)[chosen] — exp via
      // the bit-identical memo (same float argument -> same double)
      i = 0
      while (i < n) {
        var mx = Float.NegativeInfinity
        j = 0
        while (j < L) { if (em(i)(j) > mx) mx = em(i)(j); j += 1 }
        var z = 0.0
        j = 0
        while (j < L) { z += expCached(em(i)(j) - mx); j += 1 }
        conf(i) = expCached(em(i)(path(i)) - mx) / z
        i += 1
      }

      // BIO decode (C1) — reference state machine over single-char tokens
      // (every token is one char here: offsets == indices, no specials)
      val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
      var curType: String = null
      var curStart = 0
      var curEnd = 0
      def flush(): Unit = {
        if (curType != null) {
          var csum = 0.0
          var k = curStart
          while (k < curEnd) { csum += conf(k); k += 1 }
          out += Mention(
            s.doc_id, s.span_idx, curType,
            Bio.cleanEntityName(sb.toString), curStart, curEnd,
            if (curEnd > curStart) csum / (curEnd - curStart) else 1.0)
          curType = null
          sb.clear()
        }
      }
      i = 0
      while (i < n) {
        val label = labelArr(path(i))
        if (label.charAt(0) == 'B') {
          flush()
          curType = label.substring(2)
          sb.clear(); sb.append(text.charAt(i))
          curStart = i
          curEnd = i + 1
        } else if (label.charAt(0) == 'I') {
          if (curType != null && label.regionMatches(2, curType, 0, curType.length)
            && label.length - 2 == curType.length) {
            sb.append(text.charAt(i))
            curEnd = i + 1
          }
        } else { // O
          flush()
        }
        i += 1
      }
      flush()
      out.toSeq
    }
  }

  /** Emission scoring (K2): per position, per label. Gazetteer greedy
    * longest-match (the reference's dictionary-probe analog,
    * `data_augmentation.py:66,126`) stamps strong B-/I- scores over the
    * matched range; everything else gets an O prior. Output contract
    * matches the reference emission tensor: len × numLabels.
    */
  def emissions(chars: Array[String], gaz: Gazetteer): Array[Array[Float]] = {
    val n = chars.length
    val em = Array.fill(n, NumLabels)(0f)
    var i = 0
    while (i < n) { em(i)(oId) = 2.0f; i += 1 }
    i = 0
    while (i < n) {
      // longest gazetteer match starting at i
      var l = math.min(gaz.maxLen, n - i)
      var matched = 0
      var mtype: String = null
      while (l >= 1 && matched == 0) {
        val cand = new StringBuilder
        var k = 0
        while (k < l) { cand.append(chars(i + k)); k += 1 }
        gaz.surfaces.get(cand.toString) match {
          case Some(t) => matched = l; mtype = t
          case None    =>
        }
        l -= 1
      }
      if (matched > 0) {
        em(i)(bId(mtype)) = 8.0f
        var k = 1
        while (k < matched) { em(i + k)(iId(mtype)) = 8.0f; k += 1 }
        i += matched // greedy non-overlapping, like jieba longest-match
      } else {
        i += 1
      }
    }
    em
  }

  /** Viterbi decode (K4) — hand-written `crf.decode` analog. O(len·L²)
    * with L=13; returns best label-id path.
    */
  def viterbi(
      em: Array[Array[Float]],
      trans: Array[Array[Float]] = transitions): Array[Int] = {
    val n = em.length
    if (n == 0) return Array.empty
    val L = NumLabels
    val dp = Array.ofDim[Float](n, L)
    val bp = Array.ofDim[Int](n, L)
    // legal-predecessor lists (see Kernel): exact restriction of the
    // inner max — illegal candidates (trans = -1e9) can never reach the
    // finite legal maximum
    val legalPred: Array[Array[Int]] = Array.tabulate(L) { j =>
      val ks = (0 until L).filter(k => trans(k)(j) > -1e8f)
      if (ks.isEmpty) (0 until L).toArray else ks.toArray
    }
    var j = 0
    while (j < L) { dp(0)(j) = trans(L)(j) + em(0)(j); j += 1 }
    var i = 1
    while (i < n) {
      j = 0
      while (j < L) {
        val preds = legalPred(j)
        var best = Float.NegativeInfinity
        var arg = 0
        var p = 0
        while (p < preds.length) {
          val k = preds(p)
          val s = dp(i - 1)(k) + trans(k)(j)
          if (s > best) { best = s; arg = k }
          p += 1
        }
        dp(i)(j) = best + em(i)(j)
        bp(i)(j) = arg
        j += 1
      }
      i += 1
    }
    var best = Float.NegativeInfinity
    var arg = 0
    j = 0
    while (j < L) { if (dp(n - 1)(j) > best) { best = dp(n - 1)(j); arg = j }; j += 1 }
    val path = new Array[Int](n)
    path(n - 1) = arg
    i = n - 1
    while (i > 0) { path(i - 1) = bp(i)(path(i)); i -= 1 }
    path
  }

  /** Per-position confidence: softmax(emission)[chosen] — the reference's
    * confidence calc (`model_explainability.py:213-218`).
    */
  private def confidences(em: Array[Array[Float]], path: Array[Int]): Array[Double] = {
    val out = new Array[Double](path.length)
    var i = 0
    while (i < path.length) {
      var mx = Float.NegativeInfinity
      var j = 0
      while (j < NumLabels) { if (em(i)(j) > mx) mx = em(i)(j); j += 1 }
      var z = 0.0
      j = 0
      while (j < NumLabels) { z += math.exp((em(i)(j) - mx).toDouble); j += 1 }
      out(i) = math.exp((em(i)(path(i)) - mx).toDouble) / z
      i += 1
    }
    out
  }

  /** Char-level tokenizer (K1). The reference's BERT tokenizer is
    * char-level for Chinese (`utils.py:56-84`); here it is the identity
    * over characters, with max-length truncation matching `config.py:14` /
    * `utils.py:63-65`.
    */
  def tokenize(text: String, maxLen: Int = 128): Array[String] = {
    val n = math.min(text.length, maxLen)
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = text.charAt(i).toString; i += 1 }
    out
  }

  /** Decode one sentence with the full kernel (K1→K2→K4→C1). */
  def detectOne(s: Sentence, gaz: Gazetteer, maxLen: Int): Seq[Mention] = {
    val chars = tokenize(s.text, maxLen)
    if (chars.isEmpty) return Nil
    val em = emissions(chars, gaz)
    val path = viterbi(em)
    val conf = confidences(em, path)
    val tags = path.map(labelArr)
    Bio.decodeBio(
      chars.toIndexedSeq,
      tags.toIndexedSeq,
      confOf = (a, b) => {
        var sum = 0.0; var i = a
        while (i < b) { sum += conf(i); i += 1 }
        if (b > a) sum / (b - a) else 1.0
      }
    ).map { case (tpe, text, start, end, c) =>
      Mention(s.doc_id, s.span_idx, tpe, text, start, end, c)
    }
  }

  /** The batched mapPartitions detector over a typed Dataset — one narrow
    * map stage, batches of `batchSize` like the reference's
    * `texts[i:i+batch_size]` (`predict_enhanced.py:341-343`).
    */
  def detect(
      sentences: Dataset[Sentence],
      gazBc: Broadcast[Gazetteer],
      batchSize: Int = 32,
      maxLen: Int = 128,
      trans: Array[Array[Float]] = transitions,
      featsBc: Broadcast[Features.FeatureModel] = null): Dataset[Mention] = {
    val spark = sentences.sparkSession
    import spark.implicits._
    sentences.mapPartitions { it =>
      // trie memoized per executor JVM keyed by broadcast id — the task
      // only pays a cache hit, not an O(total-chars) rebuild
      val kernel = new Kernel(
        gazBc.value, maxLen, trans,
        if (featsBc == null) null else featsBc.value,
        sharedTrie = trieFor(gazBc))
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap(kernel.detect)
      }
    }
  }

  /** Detection against a gazetteer BEYOND broadcast budget (the
    * large-lexicon story the link side already has,
    * [[graft.link.Linker.surfaceResolutionLargeLexicon]]): the gazetteer
    * stays a DISTRIBUTED dataset and candidates reach each sentence
    * through a blocking-key equi-join instead of a broadcast.
    *
    * Plan shape:
    *   1. each sentence explodes to its DISTINCT char unigrams + bigrams
    *      (ids + 1-2 chars on the wire — never the text);
    *   2. the gazetteer keys each surface by its first two chars (first
    *      char for single-char surfaces) — at a 10M-surface lexicon the
    *      bigram key space is ~1M wide, so per-key candidate lists stay
    *      small and the join is AQE-skew-splittable;
    *   3. key-equi-join → per-sentence candidate surfaces, verified by
    *      containment against the sentence text;
    *   4. group back per sentence → per-sentence mini-gazetteer → the
    *      SAME [[Kernel]] (tiny trie per sentence).
    *
    * Output-equivalent to [[detect]] with the full gazetteer broadcast:
    * the kernel's emissions only depend on gazetteer surfaces that occur
    * in the sentence, every occurring surface shares its leading
    * uni/bigram with the sentence (consecutive chars), and containment
    * keeps exactly the occurring ones plus inert extras the trie scan
    * cannot match. Sentences with no candidate keep flowing through the
    * left join (feature-model-only detection still applies to them).
    */
  def detectPartitionedGazetteer(
      sentences: Dataset[Sentence],
      gazetteer: Dataset[(String, String)],
      batchSize: Int = 32,
      maxLen: Int = 128,
      trans: Array[Array[Float]] = transitions,
      featsBc: Broadcast[Features.FeatureModel] = null): Dataset[Mention] = {
    val spark = sentences.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, substring}

    val sdf = sentences.toDF()
    // distinct leading keys per sentence (narrow; ids + tiny strings only)
    val keys = sentences.flatMap { s =>
      val t = s.text
      val n = math.min(t.length, maxLen)
      val ks = scala.collection.mutable.HashSet.empty[String]
      var i = 0
      while (i < n) {
        ks += t.substring(i, i + 1)
        if (i + 1 < n) ks += t.substring(i, i + 2)
        i += 1
      }
      ks.iterator.map(k => (s.doc_id, s.span_idx, k))
    }.toDF("doc_id", "span_idx", "gkey")

    // gkey derived with java.lang.String.substring (UTF-16 code units) —
    // the SAME semantics as the sentence side's t.substring(i, i + 2)
    // above. The former SQL substring(surface, 1, 2) counted Unicode CODE
    // POINTS: a surface starting with a supplementary (non-BMP) char got
    // a 3-4-code-unit key no 2-code-unit sentence key could ever equal,
    // silently dropping its mentions (ADVICE r5, medium).
    val gazKeyed = gazetteer
      .filter((e: (String, String)) => e._1.nonEmpty)
      .map { case (surf, tpe) =>
        (surf.substring(0, math.min(2, surf.length)), surf, tpe)
      }
      .toDF("gkey", "surface", "entity_type")

    val candidates = keys.join(gazKeyed, Seq("gkey"))
      .select(col("doc_id"), col("span_idx"), col("surface"), col("entity_type"))

    // Bring the text back and group per sentence. Containment is checked
    // INSIDE the group function, not as a pre-group filter: a filter
    // would delete a sentence entirely when every one of its candidates
    // shares a leading bigram but fails containment, silently dropping
    // that sentence's feature-model-only detections (the left-outer null
    // row only exists when NO candidate joined at all).
    val joined = sdf.join(candidates, Seq("doc_id", "span_idx"), "left_outer")
      .select(col("doc_id"), col("span_idx"), col("text"), col("surface"), col("entity_type"))
      .as[(String, Int, String, Option[String], Option[String])]

    val featsLocal = featsBc
    joined
      .groupByKey { case (d, sp, _, _, _) => (d, sp) }
      .flatMapGroups { (key: (String, Int), rows: Iterator[(String, Int, String, Option[String], Option[String])]) =>
        val (d, sp) = key
        var text: String = null
        val entries = Seq.newBuilder[(String, String)]
        rows.foreach { case (_, _, t, surf, tpe) =>
          text = t
          // containment verify (candidates are leading-bigram matches)
          if (surf.isDefined && t.contains(surf.get)) entries += ((surf.get, tpe.get))
        }
        // DETERMINISTIC mini-gazetteer: shuffle arrival order must not
        // decide how a duplicated surface with conflicting types resolves
        // (sorted, so the last (surface, type) pair wins reproducibly)
        val mini = Gazetteer(entries.result().sorted)
        // one kernel (scratch matrices) per task thread; only the tiny
        // per-sentence trie differs between groups. Keyed by the task
        // closure's parameter identities; bounded (threads are pooled
        // across tasks, each task deserializes fresh parameter objects)
        val cache = PartitionedKernels.get()
        if (cache.size > 8) cache.clear()
        val kernel = cache
          .getOrElseUpdate((maxLen, trans, featsLocal), new Kernel(
            Gazetteer(Nil), maxLen, trans,
            if (featsLocal == null) null else featsLocal.value))
        kernel.detectWith(Sentence(d, sp, text), mini, GazTrie(mini))
      }
  }

  /** Per-thread kernel reuse for the partitioned-gazetteer path: the
    * maxLen×L scratch matrices are allocated once per task thread, not
    * once per sentence (the mini-trie is the only per-sentence state).
    */
  private val PartitionedKernels =
    ThreadLocal.withInitial[scala.collection.mutable.Map[Any, Kernel]](
      () => scala.collection.mutable.Map.empty)

  /** Gold-emission variant: tags are given (parity-by-construction path for
    * fixture/eval corpora — SURVEY.md §7.3). Runs the same Viterbi over
    * one-hot emissions so the CRF layer is still exercised.
    */
  def detectFromTags(
      tagged: Dataset[graft.core.TaggedSentence],
      batchSize: Int = 32): Dataset[Mention] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { ts =>
          val chars = ts.chars.toArray
          val n = chars.length
          val em = Array.fill(n, NumLabels)(0f)
          var i = 0
          while (i < n) {
            val id = Bio.LabelToId.getOrElse(ts.tags(i), oId)
            em(i)(id) = 8.0f
            i += 1
          }
          val path = if (n == 0) Array.empty[Int] else viterbi(em)
          val conf = confidences(em, path)
          val tags = path.map(labelArr)
          Bio.decodeBio(
            chars.toIndexedSeq,
            tags.toIndexedSeq,
            confOf = (a, b) => {
              var sum = 0.0; var k = a
              while (k < b) { sum += conf(k); k += 1 }
              if (b > a) sum / (b - a) else 1.0
            }
          ).map { case (tpe, text, start, end, c) =>
            Mention(ts.doc_id, ts.span_idx, tpe, text, start, end, c)
          }
        }
      }
    }
  }

  /** Broadcast helper. */
  def broadcastGazetteer(spark: SparkSession, entries: Iterable[(String, String)]): Broadcast[Gazetteer] =
    spark.sparkContext.broadcast(Gazetteer(entries))
}
