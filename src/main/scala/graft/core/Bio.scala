package graft.core

import scala.collection.mutable.ArrayBuffer

/** BIO ↔ span codec + entity-name cleaning.
  *
  * These pure functions carry the per-row parity contract with the
  * reference; their semantics replicate, branch for branch:
  *   - BIO decode:  `/root/reference/predict_enhanced.py:277-326`
  *   - BIO encode:  `/root/reference/predict_enhanced.py:434-465`
  *   - name clean:  `/root/reference/utils.py:101-123`
  *   - label vocab: `/root/reference/utils.py:87-98`
  */
object Bio {

  /** The 13-label vocabulary actually present in the reference corpus
    * (logged at `results/bert_base_chinese/eval_..._150651/evaluation.log:13-14`),
    * sorted lexicographically exactly like `get_label_list` (`utils.py:97`).
    */
  val EntityTypes: Seq[String] =
    Seq("Anatomical", "Diseases", "Drug", "Image", "Laboratory", "Operation")

  val Labels: Seq[String] =
    (EntityTypes.map("B-" + _) ++ EntityTypes.map("I-" + _) :+ "O").sorted

  val LabelToId: Map[String, Int] = Labels.zipWithIndex.toMap
  val OId: Int = LabelToId("O")

  /** True for positions the reference drops before decoding: BERT special
    * tokens and anything starting with '<' (`predict_enhanced.py:283-284`).
    */
  def isSpecialToken(tok: String): Boolean =
    tok == "[CLS]" || tok == "[SEP]" || tok == "[PAD]" || tok.startsWith("<")

  /** Python-compatible whitespace test: Java's `Character.isWhitespace`
    * excludes the non-breaking spaces Python's `str.isspace()` includes.
    */
  private def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00a0' || c == '\u2007' || c == '\u202f' || c == '\u0085'

  private val WhitelistClass =
    // mirror of the char class at utils.py:118 — CJK, ASCII alnum, listed
    // ASCII punctuation, listed full-width punctuation. Space is NOT listed,
    // so collapsed spaces are subsequently removed (reference behavior).
    ("[^一-龥a-zA-Z0-9" +
      "\\.\\,\\;\\:\\?\\!\\(\\)\\[\\]\\{\\}\\-\\+\\=/\\\\%@#\\$&\\*_" +
      "，。；：？！（）【】｛｝]").r

  // precompiled (String.replaceAll would recompile per call — measurable
  // GC churn at tens of millions of mentions)
  private val WsRun = java.util.regex.Pattern.compile("(?U)\\s+")

  /** Exact membership test for the whitelist char class above. */
  private def isWhitelisted(c: Char): Boolean =
    (c >= '一' && c <= '龥') ||
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      ".,;:?!()[]{}-+=/\\%@#$&*_".indexOf(c) >= 0 ||
      "，。；：？！（）【】｛｝".indexOf(c) >= 0

  /** `clean_entity_name` (`utils.py:101-123`), in the reference's exact
    * order: strip → collapse runs of whitespace to one space → drop chars
    * outside the whitelist → drop "##". Fast path: a string of purely
    * whitelisted chars with no '#' is returned unchanged, allocation-free
    * (the overwhelmingly common case for clinical-entity surfaces).
    */
  def cleanEntityName(entityText: String): String = {
    var i = 0
    var fast = true
    while (fast && i < entityText.length) {
      val c = entityText.charAt(i)
      if (c == '#' || !isWhitelisted(c)) fast = false
      i += 1
    }
    if (fast) return entityText

    var text = entityText.dropWhile(isPySpace).reverse.dropWhile(isPySpace).reverse
    // Python re.sub(r'\s+', ' ') is unicode-aware; (?U) gives Java parity.
    text = WsRun.matcher(text).replaceAll(" ")
    text = WhitelistClass.replaceAllIn(text, "")
    text.replace("##", "")
  }

  /** Strip BERT subword markers (`predict_enhanced.py:286`). */
  def stripSubword(tok: String): String = tok.replace("##", "")

  /** BIO decode → mentions, replicating the state machine at
    * `predict_enhanced.py:282-326`:
    *   - special tokens skipped entirely (not counted in offsets);
    *   - `B-X` closes any open entity and opens a new one;
    *   - `I-X` extends ONLY if an entity is open AND its type matches
    *     (`:306-310`); a leading bare `I-X` produces nothing;
    *   - `O` closes; a trailing open entity is flushed (`:320-326`);
    *   - offsets are running char counts over kept (subword-stripped)
    *     tokens, half-open [start, end) (`:303-304,310`);
    *   - mention text is the joined tokens passed through
    *     `cleanEntityName`.
    *
    * `confidence` is filled by the caller (detector); here mentions carry
    * the provided per-entity confidence aggregation hook via `confOf`.
    */
  def decodeBio(
      tokens: IndexedSeq[String],
      labels: IndexedSeq[String],
      confOf: (Int, Int) => Double = (_, _) => 1.0): Seq[(String, String, Int, Int, Double)] = {
    val out = ArrayBuffer.empty[(String, String, Int, Int, Double)]
    var kept = 0 // running char length of kept tokens
    var keptIdx = 0 // index among kept tokens (for confidence ranges)
    var curType: String = null
    var curTokens: StringBuilder = null
    var curStart = 0
    var curEnd = 0
    var curTokStart = 0
    var curTokEnd = 0 // exclusive kept-token index of the entity's last token
    val n = math.min(tokens.length, labels.length)
    var j = 0

    def flush(): Unit = {
      if (curType != null) {
        val text = cleanEntityName(curTokens.toString.replace("##", ""))
        // confidence range is [curTokStart, curTokEnd) — the entity's OWN
        // tokens only. (Using the running keptIdx here would include the
        // non-entity token that triggered the flush, diverging from the
        // Kernel's exact [start,end) average.)
        out += ((curType, text, curStart, curEnd, confOf(curTokStart, curTokEnd)))
        curType = null
        curTokens = null
      }
    }

    while (j < n) {
      val rawTok = tokens(j)
      if (!isSpecialToken(rawTok)) {
        val tok = stripSubword(rawTok)
        val label = labels(j)
        val startOfTok = kept
        kept += tok.length
        keptIdx += 1
        if (label.startsWith("B-")) {
          flush()
          curType = label.substring(2)
          curTokens = new StringBuilder(tok)
          curStart = startOfTok
          curEnd = kept
          curTokStart = keptIdx - 1
          curTokEnd = keptIdx
        } else if (label.startsWith("I-") && curType != null) {
          if (label.substring(2) == curType) {
            curTokens.append(tok)
            curEnd = kept
            curTokEnd = keptIdx
          }
          // type mismatch: token is kept (counts in offsets) but ignored
        } else if (label == "O") {
          // flush BEFORE this token was appended? No: reference appends the
          // token to orig_tokens first, then closes — offsets unaffected
          // because the entity's end was set by its own last token.
          flush()
        }
        // any other label (shouldn't occur) behaves like mismatched I-: no-op
      }
      j += 1
    }
    flush()
    out.toSeq
  }

  /** Spans → per-char BIO tags, replicating `predict_enhanced.py:438-465`:
    * all-`O` init, `B-` stamped at start (bounds-checked), `I-` over
    * (start, end) (bounds-checked). Later entities overwrite earlier ones
    * on overlap, exactly like the reference's sequential stamping.
    */
  def encodeBio(textLen: Int, entities: Seq[(String, Int, Int)]): IndexedSeq[String] = {
    val tags = Array.fill(textLen)("O")
    entities.foreach { case (tpe, start, end) =>
      // python `bio_tags[start]` wraps negative indices (`:459` guards only
      // `start < len`); replicated bit-for-bit even though the decoder
      // never emits negative starts.
      if (start < textLen && start >= -textLen) {
        tags(if (start < 0) start + textLen else start) = s"B-$tpe"
      }
      var i = math.max(start + 1, 0)
      while (i < end && i < textLen) { tags(i) = s"I-$tpe"; i += 1 }
    }
    tags.toIndexedSeq
  }

  /** Label-vocabulary induction (`utils.py:87-98`): set-union of tags over
    * already-parsed (char, tag) lines, sorted lexicographically.
    */
  def labelVocab(tags: Iterator[String]): Seq[String] =
    tags.toSet.toSeq.sorted

  /** seqeval/conlleval-compatible chunk extraction (default, non-strict
    * scheme) — the semantics behind the reference's published metrics
    * (`evaluate.py:310-337` uses seqeval). Differs from the reference's
    * own prediction decoder (`decodeBio`) in one rule: an `I-X` after `O`,
    * after a different type, or at sequence start OPENS a chunk instead of
    * being dropped. Verified against `evaluation_results.json` supports
    * (944/441/173/93/150/88 on test.txt gold tags).
    *
    * @return (entityType, startTokenIdx, endTokenIdx) half-open
    */
  def seqevalEntities(tags: IndexedSeq[String]): Seq[(String, Int, Int)] = {
    val out = ArrayBuffer.empty[(String, Int, Int)]
    var curType: String = null
    var curStart = 0
    var i = 0
    while (i < tags.length) {
      val t = tags(i)
      if (t == "O" || (!t.startsWith("B-") && !t.startsWith("I-"))) {
        if (curType != null) { out += ((curType, curStart, i)); curType = null }
      } else {
        val tpe = t.substring(2)
        if (t.startsWith("B-") || curType == null || curType != tpe) {
          if (curType != null) out += ((curType, curStart, i))
          curType = tpe
          curStart = i
        }
      }
      i += 1
    }
    if (curType != null) out += ((curType, curStart, tags.length))
    out.toSeq
  }
}
