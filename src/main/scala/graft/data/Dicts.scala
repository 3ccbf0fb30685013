package graft.data

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Dictionary scans (SURVEY.md §2.1 S3): the reference's JSON map files —
  * `synonym_dict.json` (`{word: [synonyms]}`, `data_augmentation.py:19-23`)
  * and `entity_dict.json` (`{entity_type: [surfaces]}`, `:25-29`).
  *
  * Dictionaries are broadcast-side by contract (they seed gazetteers and
  * augmentation), so a driver-side parse through the Hadoop FS API is the
  * right shape: works on local paths AND cluster storage, one read, then
  * `sparkContext.broadcast`.
  */
object Dicts {

  private val mapper = new ObjectMapper()

  /** Load a `{key: [values]}` JSON map from any Hadoop-visible path. */
  def loadJsonDict(spark: SparkSession, path: String): Map[String, IndexedSeq[String]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val m =
      try mapper.readValue(in.readAllBytes(), classOf[java.util.Map[String, java.util.List[String]]])
      finally in.close()
    m.asScala.map { case (k, v) => k -> v.asScala.toIndexedSeq }.toMap
  }

  /** The reference's sample-dictionary generator analog
    * (`data_augmentation.py:184-216`): dictionaries derived from the
    * engine's own vocabulary when no files exist.
    */
  def defaultEntityDict: Map[String, IndexedSeq[String]] =
    DocsGen.Vocab.map { case (k, v) => k -> v }
}
