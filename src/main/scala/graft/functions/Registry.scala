package graft.functions

import graft.core.Bio
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-visible function surface (SURVEY.md §2.10).
  *
  * `clean_entity_name` also exists as a pure Column-expression chain
  * (`cleanEntityNameCol`) — Catalyst-only, whole-stage-codegen'd — proven
  * equivalent to the reference-parity Scala implementation by
  * `FunctionsSpec`. The UDF registrations make every codec available from
  * `spark.sql(...)`.
  */
object Registry {

  /** P3 as pure Columns: strip → collapse unicode whitespace → whitelist →
    * drop "##" (the exact order of `utils.py:101-123`). `(?U)` makes Java's
    * `\s` match the same unicode whitespace Python's does.
    */
  def cleanEntityNameCol(c: Column): Column = {
    val stripped = regexp_replace(c, "(?U)^\\s+|(?U)\\s+$", "")
    val collapsed = regexp_replace(stripped, "(?U)\\s+", " ")
    val whitelisted = regexp_replace(
      collapsed,
      "[^\\x{4e00}-\\x{9fa5}a-zA-Z0-9\\.\\,\\;\\:\\?\\!\\(\\)\\[\\]\\{\\}\\-\\+\\=/\\\\%@#\\$&\\*_，。；：？！（）【】｛｝]",
      "")
    regexp_replace(whitelisted, "##", "")
  }

  /** Label projection P4: `B-X`/`I-X` → `X`, `O` → `O`
    * (`predict_enhanced.py:299` `label[2:]`).
    */
  def stripBioPrefixCol(c: Column): Column =
    when(c === "O", lit("O")).otherwise(substring(c, 3, Int.MaxValue))

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("clean_entity_name", (s: String) =>
      Bio.cleanEntityName(if (s == null) "" else s))
    spark.udf.register("decode_bio", (chars: Seq[String], tags: Seq[String]) =>
      Bio.decodeBio(
        Option(chars).getOrElse(Seq.empty).toIndexedSeq,
        Option(tags).getOrElse(Seq.empty).toIndexedSeq)
        .map { case (tpe, text, start, end, conf) => (tpe, text, start, end, conf) })
    spark.udf.register("encode_bio", (len: Int, ents: Seq[org.apache.spark.sql.Row]) =>
      Bio.encodeBio(len,
        Option(ents).getOrElse(Seq.empty).map(r => (r.getString(0), r.getInt(1), r.getInt(2)))))
    spark.udf.register("seqeval_entities", (tags: Seq[String]) =>
      Bio.seqevalEntities(Option(tags).getOrElse(Seq.empty).toIndexedSeq))
    VecDot.register(spark)
    SimHash64.register(spark)
    MinHashSig.register(spark)
    SigEqCount.register(spark)
    ShingleHashes.register(spark)
    Fingerprint64.register(spark)
    LanguageId.register(spark)
    HllDistinct.register(spark)
    SketchFunctions.register(spark)
    ChunkText.register(spark)
  }
}
