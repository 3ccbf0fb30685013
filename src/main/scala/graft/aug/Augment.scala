package graft.aug

import graft.core.{Hashing, TaggedSentence}
import org.apache.spark.sql.Dataset
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Dictionary-driven data augmentation — the Spark re-architecture of
  * `data_augmentation.py` (U1-U6 in SURVEY.md §2.8).
  *
  * Semantics replicate the reference's `synonym_replace`
  * (`data_augmentation.py:31-86`) and `entity_replace` (`:88-151`)
  * including their subtle sequential-slice-assignment behavior:
  * replacements apply one at a time in (shuffled) selection order, indices
  * are NOT re-adjusted after a length-changing replacement, and the
  * synonym path re-checks dictionary membership of whatever text now sits
  * at the stored slice (`:76-78`), silently skipping shifted slices.
  * Longer entity replacements insert the extra chars one by one at the
  * original `end` (`:143-148`).
  *
  * Two deliberate deviations, both documented in SURVEY.md §2.8:
  *  - the reference segments O-runs with jieba; we use greedy longest-match
  *    against the synonym dictionary's own keys (no jieba on the JVM);
  *  - the reference's RNG is the UNSEEDED global `random` module (its
  *    results are irreproducible by construction); every random choice
  *    here is keyed on `hash(doc_id, op, counter)` so augmentation is
  *    deterministic and partition-order-independent.
  */
object Augment {

  /** Deterministic RNG stream for one (docId, op) pair. */
  final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state = Hashing.mix64(state); state }
    def nextInt(n: Int): Int = Hashing.pick(nextLong(), n)
    def shuffle[T](xs: ArrayBuffer[T]): Unit = {
      var i = xs.length - 1
      while (i > 0) {
        val j = nextInt(i + 1)
        val t = xs(i); xs(i) = xs(j); xs(j) = t
        i -= 1
      }
    }
    def choice[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  /** Greedy longest-match segmentation of a string against dictionary
    * keys (the jieba stand-in): at each position take the longest dict key
    * that matches, else one char.
    */
  def segment(text: String, dict: Map[String, IndexedSeq[String]], maxKeyLen: Int): Seq[String] = {
    val out = ListBuffer.empty[String]
    var i = 0
    while (i < text.length) {
      var l = math.min(maxKeyLen, text.length - i)
      var seg: String = null
      while (l > 1 && seg == null) {
        val cand = text.substring(i, i + l)
        if (dict.contains(cand)) seg = cand
        l -= 1
      }
      if (seg == null) seg = text.substring(i, i + 1)
      out += seg
      i += seg.length
    }
    out.toSeq
  }

  /** `synonym_replace` (`data_augmentation.py:31-86`). */
  def synonymReplace(
      words: IndexedSeq[String],
      labels: IndexedSeq[String],
      synonyms: Map[String, IndexedSeq[String]],
      rng: Rng,
      replaceRatio: Double = 0.1): (IndexedSeq[String], IndexedSeq[String]) = {
    if (synonyms.isEmpty) return (words, labels)
    val maxKeyLen = synonyms.keysIterator.map(_.length).max
    val newWords = ArrayBuffer(words: _*)
    val newLabels = ArrayBuffer(labels: _*)
    val nReplace = math.max(1, (words.length * replaceRatio).toInt)

    // replaceable O-run segments (run length > 1, segment len > 1, in dict)
    val replaceable = ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < labels.length) {
      if (labels(i).startsWith("O")) {
        val start = i
        while (i < labels.length && labels(i).startsWith("O")) i += 1
        val end = i
        if (end - start > 1) {
          val text = words.slice(start, end).mkString
          var pos = start
          segment(text, synonyms, maxKeyLen).foreach { seg =>
            if (seg.length > 1 && synonyms.get(seg).exists(_.nonEmpty))
              replaceable += ((pos, pos + seg.length))
            pos += seg.length
          }
        }
      } else i += 1
    }

    if (replaceable.nonEmpty) {
      rng.shuffle(replaceable)
      replaceable.take(nReplace).foreach { case (start0, end0) =>
        // membership re-check on the CURRENT content (indices may have
        // shifted after a previous length-changing replacement — the
        // reference behaves identically, data_augmentation.py:76-78).
        // Python slices clamp out-of-range bounds; mirror that.
        val start = math.min(start0, newWords.length)
        val end = math.min(end0, newWords.length)
        val originalWord = newWords.slice(start, end).mkString
        synonyms.get(originalWord).filter(_.nonEmpty).foreach { syns =>
          val synonym = rng.choice(syns)
          val chars = synonym.map(_.toString)
          newWords.remove(start, end - start)
          newWords.insertAll(start, chars)
          newLabels.remove(start, end - start)
          newLabels.insertAll(start, Seq.fill(chars.length)("O"))
        }
      }
    }
    (newWords.toIndexedSeq, newLabels.toIndexedSeq)
  }

  /** `entity_replace` (`data_augmentation.py:88-151`). Note the entity
    * scan here is the reference's own: `B-` opens, ANY `I-` continues
    * (no type check, `:109-117`).
    */
  def entityReplace(
      words: IndexedSeq[String],
      labels: IndexedSeq[String],
      entityDict: Map[String, IndexedSeq[String]],
      rng: Rng,
      replaceRatio: Double = 0.1): (IndexedSeq[String], IndexedSeq[String]) = {
    if (entityDict.isEmpty) return (words, labels)
    val newWords = ArrayBuffer(words: _*)
    val newLabels = ArrayBuffer(labels: _*)

    val entities = ArrayBuffer.empty[(Int, Int, String)]
    var i = 0
    while (i < labels.length) {
      if (labels(i).startsWith("B-")) {
        val tpe = labels(i).substring(2)
        val start = i
        i += 1
        while (i < labels.length && labels(i).startsWith("I-")) i += 1
        entities += ((start, i, tpe))
      } else i += 1
    }

    val nReplace = math.max(1, (entities.length * replaceRatio).toInt)
    if (entities.nonEmpty && nReplace > 0) {
      rng.shuffle(entities)
      entities.take(nReplace).foreach { case (start0, end0, tpe) =>
        entityDict.get(tpe).filter(_.nonEmpty).foreach { forms =>
          val newEntity = rng.choice(forms)
          val chars = newEntity.map(_.toString)
          val oldLen = end0 - start0
          val newLen = chars.length
          val entLabels = ("B-" + tpe) +: Seq.fill(math.max(newLen - 1, 0))("I-" + tpe)
          // python slice assignment with clamped bounds:
          //   new_words[start:end] = new_entity_chars
          //   new_labels[start:end] = new_entity_labels[:old_len]
          val start = math.min(start0, newWords.length)
          val end = math.min(end0, newWords.length)
          newWords.remove(start, end - start)
          newWords.insertAll(start, chars)
          newLabels.remove(start, end - start)
          newLabels.insertAll(start, entLabels.take(oldLen))
          // new entity longer: insert extras one by one at the ORIGINAL
          // end index (data_augmentation.py:143-148)
          if (newLen > oldLen) {
            var insertAt = math.min(end0, newWords.length)
            var j = oldLen
            while (j < newLen) {
              newWords.insert(insertAt, chars(j))
              newLabels.insert(insertAt, entLabels(j))
              insertAt += 1
              j += 1
            }
          }
        }
      }
    }
    (newWords.toIndexedSeq, newLabels.toIndexedSeq)
  }

  /** `augment_data` (`data_augmentation.py:153-181`): synonym then entity. */
  def augmentOne(
      ts: TaggedSentence,
      synonyms: Map[String, IndexedSeq[String]],
      entityDict: Map[String, IndexedSeq[String]],
      seed: Long,
      synonymRatio: Double = 0.1,
      entityRatio: Double = 0.1): TaggedSentence = {
    val rng = new Rng(Hashing.hash2(seed, Hashing.hashString(ts.doc_id + "#" + ts.span_idx)))
    val (w1, l1) = synonymReplace(ts.chars.toIndexedSeq, ts.tags.toIndexedSeq, synonyms, rng, synonymRatio)
    val (w2, l2) = entityReplace(w1, l1, entityDict, rng, entityRatio)
    ts.copy(doc_id = ts.doc_id + "-aug", chars = w2, tags = l2)
  }

  /** The training-corpus augmentation dataflow (`train_enhanced.py:190-249`):
    * a deterministic 70% Bernoulli gate per sentence (U2 — the reference's
    * `random.random() < 0.7`, seeded here), augmented rows unioned with the
    * originals (U1).
    */
  def augmentCorpus(
      corpus: Dataset[TaggedSentence],
      synonyms: Map[String, IndexedSeq[String]],
      entityDict: Map[String, IndexedSeq[String]],
      seed: Long = 42L,
      gate: Double = 0.7): Dataset[TaggedSentence] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val syn = spark.sparkContext.broadcast(synonyms)
    val ent = spark.sparkContext.broadcast(entityDict)
    val augmented = corpus
      .filter { ts =>
        Hashing.uniformDouble(Hashing.hash2(seed, Hashing.hashString(ts.doc_id + "|gate"))) < gate
      }
      .map(ts => augmentOne(ts, syn.value, ent.value, seed))
    corpus.union(augmented)
  }
}
