package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, and
  * document fingerprinting over a `documents(doc_id, text, ...)` table.
  *
  * Everything here is pure Column expressions (whole-stage codegen) except
  * the n-gram language scorer, which is a deterministic Scala UDF over a
  * broadcast profile map — scalar, no shuffle, applied post-scan so column
  * pruning still reaches parquet.
  */
object TextAnalysis {

  /** Dedup-normalization: lowercase, trim, collapse whitespace runs — the
    * standard pre-pass before exact dedup so trivially-reformatted copies
    * (case, indentation, CRLF) hash identically. Pure Column chain
    * (codegen); compose with `Dedup.dropExactDuplicates` by deduping on
    * `df.withColumn("text_norm", normalizeText($"text"))`.
    */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace token count — `size(split(...))` stays in codegen. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: alnum runs + each punctuation char counts as a
    * token (a cheap deterministic proxy for a BPE vocab's behavior).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), c => length(trim(c)) > 0))

  /** Quality features + a composite score in [0,1]:
    * length band, punctuation ratio, stopword ratio, mean word length.
    * Deterministic arithmetic only — oracle-checkable in ANSI SQL.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val toks = split(trim(text), "\\s+")
    val nTok = size(toks)
    val nChar = length(text)
    val nPunct = nChar - length(regexp_replace(text, "[\\.,;:!\\?]", ""))
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    df.withColumn("n_tokens", nTok)
      .withColumn("punct_ratio", round(nPunct.cast("double") / greatest(nChar, lit(1)), 6))
      .withColumn("stopword_ratio", round(nStop.cast("double") / greatest(nTok, lit(1)), 6))
      .withColumn("mean_word_len",
        round((nChar - (nTok - lit(1))).cast("double") / greatest(nTok, lit(1)), 6))
      .withColumn("quality_score",
        round(
          least(nTok.cast("double") / lit(100.0), lit(1.0)) * lit(0.5)
            + (lit(1.0) - least(col("punct_ratio") * 10, lit(1.0))) * lit(0.25)
            + least(col("stopword_ratio") * 5, lit(1.0)) * lit(0.25),
          6))
  }

  /** Polynomial rolling-hash fingerprint of the document text (Rabin-Karp
    * style, base 257 mod 2^61-1), plus windowed shingle fingerprints for
    * containment checks. Pure function → UDF (one long per row; cheap).
    */
  val FingerprintMod: Long = (1L << 61) - 1

  /** Perplexity-style quality signal: per-document CHAR-BIGRAM
    * cross-entropy under a language model estimated from the corpus
    * itself — the standard "does this look like the rest of the data"
    * filter for training corpora (boilerplate, encoding garbage, and
    * wrong-language documents score high). Fully relational and
    * codegen-friendly:
    *
    *   bigrams  = explode(transform(sequence(...), i -> substring(text,i,2)))
    *   model    = conditional P(c2|c1) with add-1 smoothing over the
    *              observed prefix alphabet V:
    *              P = (count(c1c2)+1) / (prefixCount(c1)+V)
    *   score(d) = -mean(ln P) over d's bigrams (0 for texts shorter than 2)
    *
    * The count tables are alphabet-bounded (≤ |Σ|²) regardless of corpus
    * size, so the scoring join broadcasts; the only data-sized shuffles
    * are the count aggregation and the per-doc mean — both partial-agg.
    */
  def charBigramCrossEntropy(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // filter to true 2-char windows: Spark's sequence(1, 0) is DESCENDING
    // [1, 0] (not empty), so texts shorter than 2 chars would otherwise
    // produce phantom single-char "bigrams"
    val bg = df.select(
      col(idCol),
      explode(expr(
        s"filter(transform(sequence(1, greatest(length($textCol) - 1, 0)), " +
          s"i -> substring($textCol, i, 2)), b -> length(b) = 2)"))
        .as("b"))
    val cnt = bg.groupBy("b").agg(count(lit(1)).as("c"))
    val pre = cnt.groupBy(substring(col("b"), 1, 1).as("c1")).agg(sum(col("c")).as("cp"))
    val v = pre.agg(count(lit(1)).as("v"))
    val scored = bg
      .join(broadcast(cnt), "b")
      .join(broadcast(pre), substring(col("b"), 1, 1) === col("c1"))
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg((-avg(log((col("c") + 1.0) / (col("cp") + col("v"))))).as("ce"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), round(coalesce(col("ce"), lit(0.0)), 4).as("char_entropy"))
  }

  def fingerprint(text: String): Long = {
    var h = 0L
    var i = 0
    while (i < text.length) {
      // multiply-add in 128-bit via Math.multiplyHigh-free route: use
      // BigInt-free split multiplication mod 2^61-1
      h = mulMod(h, 257L) + text.charAt(i).toLong
      if (h >= FingerprintMod) h -= FingerprintMod
      i += 1
    }
    h
  }

  private def mulMod(a: Long, b: Long): Long = {
    // (a*b) mod 2^61-1 with 128-bit intermediate
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold: x mod (2^61-1) where x = hi*2^64 + lo
    val x = (lo & FingerprintMod) + ((lo >>> 61) | (hi << 3)) + (hi >>> 58)
    val y = (x & FingerprintMod) + (x >>> 61)
    if (y >= FingerprintMod) y - FingerprintMod else y
  }

  val fingerprintUdf = udf((s: String) => fingerprint(if (s == null) "" else s))

  /** Column form via the NATIVE codegen'd expression (null → fingerprint("")
    * = 0, matching the UDF). */
  def fingerprintCol(c: Column): Column =
    graft.functions.Fingerprint64.fingerprint64(coalesce(c, lit("")))

  /** Character n-gram language-ID: scores each language's profile by how
    * many of the text's trigrams appear in a small per-language profile
    * (top trigrams of common function words). Deterministic heuristic —
    * the real-world replacement is a fastText-style model; the Spark
    * plumbing (broadcast profiles, scalar UDF post-scan) is identical.
    */
  val LangProfiles: Map[String, Set[String]] = Map(
    "en" -> Set(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", " to", "to ", " is", "is "),
    "es" -> Set(" de", "de ", " la", "la ", " el", "el ", "os ", " qu", "que", "ue ", " en", "en ", "ión"),
    "fr" -> Set(" le", "le ", " de", "de ", " et", "et ", " la", "la ", "es ", " un", "un ", "ent", " à "),
    "de" -> Set(" de", "der", "er ", " un", "und", "nd ", " di", "die", "ie ", "ch ", "ein", "sch", " zu"),
    "zh" -> Set("的", "了", "在", "是", "和", "有", "不", "人", "这", "中")
  )

  /** Defined evaluation order: ties go to the EARLIEST language here. The
    * r2 version iterated the `LangProfiles` Map directly, whose 5-entry
    * hash iteration order is an implementation detail of the Scala
    * collections — a tie-broken prediction could silently change across
    * Scala versions (caught by the golden-vector de-circularization).
    */
  val LangOrder: Seq[String] = Seq("en", "es", "fr", "de", "zh")

  def languageId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val t = " " + text.toLowerCase + " "
    var best = "und"
    var bestScore = 0.0
    LangOrder.foreach { lang =>
      val profile = LangProfiles(lang)
      var hits = 0
      profile.foreach { g =>
        var idx = t.indexOf(g)
        while (idx >= 0) { hits += 1; idx = t.indexOf(g, idx + 1) }
      }
      val score = hits.toDouble / math.max(t.length, 1)
      if (score > bestScore) { bestScore = score; best = lang }
    }
    best
  }

  val languageIdUdf = udf((s: String) => languageId(s))

  /** Column form via the NATIVE codegen'd expression (null → "und",
    * matching the UDF's languageId(null) behavior). */
  def languageIdCol(c: Column): Column =
    graft.functions.LanguageId.language_id(coalesce(c, lit("")))

  // --------------------------------------------------- PII redaction

  /** PII patterns, ordered (URL first so addresses inside URLs redact as
    * part of the URL). Kept to constructs with IDENTICAL semantics in
    * Java regex (Spark codegen) and RE2 (the DuckDB oracle): character
    * classes, bounded repetition, \b, alternation — no lookaround, no
    * backrefs. ASCII \d/\w in both engines.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[-.]?\\d{3,4}[-.]?\\d{4}\\b" -> "<PHONE>")

  /** Redact PII in place — a pure `regexp_replace` chain (codegen'd, no
    * UDF), the standard pre-training scrub for emails/IPs/phones/URLs.
    */
  def redactPiiCol(c: Column): Column =
    PiiPatterns.foldLeft(coalesce(c, lit(""))) { case (acc, (p, r)) =>
      regexp_replace(acc, p, r)
    }

  /** `redactPii(df)`: every column untouched except `textCol` scrubbed. */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, redactPiiCol(col(textCol)))

  // --------------------------------------------- repetition statistics

  /** Gopher-style repetition statistics per document over word w-grams:
    *
    *  - `n_grams`        total w-gram occurrences,
    *  - `top_gram_n`     occurrences of the most frequent w-gram,
    *  - `top_gram_frac`  top_gram_n / n_grams (the "fraction in the most
    *                     common n-gram" quality rule),
    *  - `dup_gram_frac`  (n_grams − distinct)/n_grams.
    *
    * Relational shape: one explode of the NON-distinct native shingle
    * hashes (only counts matter, so hashes — never gram strings — hit
    * the shuffle), a (doc, gram) count with map-side combine, then a
    * per-doc aggregate. Documents too short for any gram keep a row with
    * zeros (left join back), so the filter `top_gram_frac > t` never
    * silently drops them.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String, w: Int = 2): DataFrame = {
    val grams = df.select(
      col(idCol).as("id"),
      explode(graft.functions.ShingleHashes.shingle_hashes(
        coalesce(col(textCol), lit("")), w, dedup = false)).as("g"))
    val perGram = grams.groupBy("id", "g").agg(count(lit(1)).as("n"))
    val perDoc = perGram.groupBy("id").agg(
      sum("n").as("n_grams"),
      max("n").as("top_gram_n"),
      count(lit(1)).as("distinct_grams"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("top_gram_n"), lit(0L)).as("top_gram_n"),
        round(coalesce(col("top_gram_n") / col("n_grams"), lit(0.0)), 6).as("top_gram_frac"),
        round(coalesce((col("n_grams") - col("distinct_grams")) / col("n_grams"), lit(0.0)), 6)
          .as("dup_gram_frac"))
  }
}
