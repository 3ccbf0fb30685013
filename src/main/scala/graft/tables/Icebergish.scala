package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table layer over partitioned Parquet
  * (SURVEY.md §7.0: no Iceberg runtime jar ships in this environment, so
  * the table format is reimplemented minimally — same commit semantics,
  * swappable for a real Iceberg catalog).
  *
  * Layout:
  * {{{
  *   <root>/data/snap-<id>/...parquet     immutable data files per commit
  *   <root>/manifests/snap-<id>.json      snapshot manifest:
  *       {snapshot, parent, mode, files[], rows, schema, committed_at}
  *   <root>/current                       pointer file (atomic rename)
  * }}}
  *
  * Guarantees:
  *  - snapshot isolation: readers resolve `current` once, then read only
  *    the immutable file set of that snapshot's manifest chain;
  *  - atomic commit: manifest is fully written before the pointer flips
  *    (rename is atomic on HDFS/local posix);
  *  - time travel: `read(spark, root, Some(snapshotId))`.
  *
  * Append manifests reference their parent; the effective file set is the
  * union along the parent chain (cut by an `overwrite` manifest).
  */
object Icebergish {

  private val mapper = new ObjectMapper()

  case class Snapshot(
      id: Long,
      parent: Long, // -1 = none
      mode: String, // "append" | "overwrite"
      files: Seq[String],
      rows: Long,
      committedAt: String,
      partitionBy: Seq[String] = Nil,
      tag: Option[String] = None)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currentSnapshotId(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new Path(root, "current")
    if (!f.exists(p)) {
      // recovery fallback: a crash before the FIRST pointer flip (the only
      // remaining window — later flips are rename-with-overwrite, atomic)
      // leaves fully-written manifests with no pointer; resolve to the max
      // manifest id so readers never fail on a mid-bootstrap table.
      val mDir = new Path(root, "manifests")
      if (!f.exists(mDir)) None
      else {
        val ids = f.listStatus(mDir).toSeq
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("snap-") && n.endsWith(".json") =>
            n.stripPrefix("snap-").stripSuffix(".json").toLong
          }
        if (ids.isEmpty) None else Some(ids.max)
      }
    } else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  def readManifest(spark: SparkSession, root: String, id: Long): Snapshot = {
    val f = fs(spark, root)
    val in = f.open(new Path(root, s"manifests/snap-$id.json"))
    val m =
      try mapper.readValue(in.readAllBytes(), classOf[java.util.Map[String, Object]])
      finally in.close()
    Snapshot(
      m.get("snapshot").toString.toLong,
      m.get("parent").toString.toLong,
      m.get("mode").toString,
      m.get("files").asInstanceOf[java.util.List[String]].asScala.toSeq,
      m.get("rows").toString.toLong,
      m.get("committed_at").toString,
      Option(m.get("partition_by")) // absent in pre-partitioning manifests
        .map(_.asInstanceOf[java.util.List[String]].asScala.toSeq)
        .getOrElse(Nil),
      Option(m.get("tag")).map(_.toString))
  }

  /** Effective file set of a snapshot: walk the parent chain until an
    * overwrite (or the root).
    */
  def fileSet(spark: SparkSession, root: String, id: Long): Seq[String] = {
    val files = mutable.ListBuffer.empty[String]
    var cur = id
    var done = false
    while (!done) {
      val s = readManifest(spark, root, cur)
      files.prependAll(s.files)
      if (s.mode == "overwrite" || s.parent < 0) done = true else cur = s.parent
    }
    files.toSeq
  }

  /** Commit a DataFrame as a new snapshot. Returns the new snapshot id.
    *
    * With `partitionBy` non-empty the snapshot's data files are laid out
    * hive-style (`pred=treated_by/part-...parquet`) and the partition spec
    * is recorded in the manifest — the "partitioned graph table" shape:
    * a reader of one predicate touches only that predicate's files.
    *
    * An idempotence `tag` (e.g. a streaming batch id, a resumable chunk
    * id) rides IN the manifest, so "was this unit of work committed"
    * becomes transactional with the atomic pointer flip — writers that
    * track progress in a separate file have a crash window between the
    * data commit and the progress write; [[committedTags]] closes it.
    */
  def commit(
      df: DataFrame,
      root: String,
      mode: String = "append",
      partitionBy: Seq[String] = Nil,
      tag: Option[String] = None): Long = {
    require(mode == "append" || mode == "overwrite")
    val spark = df.sparkSession
    val f = fs(spark, root)
    val parent = currentSnapshotId(spark, root).getOrElse(-1L)
    val id = parent + 1
    val dataDir = new Path(root, s"data/snap-$id")

    // crash recovery: a data dir with NO manifest is uncommitted garbage
    // (the manifest is always written after the data) — a writer that died
    // mid-write must not brick every later commit on errorifexists
    if (f.exists(dataDir) && !f.exists(new Path(root, s"manifests/snap-$id.json")))
      f.delete(dataDir, true)

    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataDir.toString)

    // recursive listing: partitioned layouts nest files under key=value dirs
    val rootQ = f.makeQualified(new Path(root)).toString
    val committed = {
      val buf = mutable.ArrayBuffer.empty[String]
      val it = f.listFiles(dataDir, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          buf += st.getPath.toString.stripPrefix(rootQ + "/")
      }
      buf.sorted.toSeq
    }
    val rows =
      if (committed.isEmpty) 0L
      else {
        val paths = committed.map(p => s"$root/$p")
        val reader =
          if (partitionBy.nonEmpty)
            spark.read.option("basePath", f.makeQualified(dataDir).toString)
          else spark.read
        reader.parquet(paths: _*).count()
      }

    val manifest = new java.util.LinkedHashMap[String, Object]()
    manifest.put("snapshot", java.lang.Long.valueOf(id))
    manifest.put("parent", java.lang.Long.valueOf(parent))
    manifest.put("mode", mode)
    manifest.put("files", committed.toList.asJava)
    manifest.put("rows", java.lang.Long.valueOf(rows))
    manifest.put("committed_at", java.time.Instant.now().toString)
    if (partitionBy.nonEmpty) manifest.put("partition_by", partitionBy.toList.asJava)
    tag.foreach(manifest.put("tag", _))
    manifest.put("schema", df.schema.json)

    f.mkdirs(new Path(root, "manifests"))
    val manifestPath = new Path(root, s"manifests/snap-$id.json")
    val out = f.create(manifestPath, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(manifest))
    finally out.close()

    // atomic pointer flip: write tmp, rename OVER the old pointer in one
    // filesystem op (FileContext rename with OVERWRITE — posix rename(2)
    // semantics). The previous delete-then-rename had a window where a
    // racing reader found no `current` at all (ADVICE r1).
    val tmp = new Path(root, s"current.tmp-$id")
    val o2 = f.create(tmp, true)
    try o2.write(id.toString.getBytes(StandardCharsets.UTF_8))
    finally o2.close()
    val cur = new Path(root, "current")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.makeQualified(new Path(root)).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp), f.makeQualified(cur),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    id
  }

  /** Read the table at `current` (or a past snapshot: time travel).
    *
    * Partitioned snapshots are read with their own `basePath` so the
    * hive partition columns are recovered; snapshots in the chain may mix
    * partition specs (e.g. a legacy unpartitioned append followed by
    * partitioned ones) — they are aligned with `unionByName`.
    */
  def read(spark: SparkSession, root: String, snapshot: Option[Long] = None): DataFrame = {
    val id = snapshot
      .orElse(currentSnapshotId(spark, root))
      .getOrElse(sys.error(s"no current snapshot in $root"))
    val chain = mutable.ListBuffer.empty[Snapshot]
    var cur = id
    var done = false
    while (!done) {
      val s = readManifest(spark, root, cur)
      chain.prepend(s)
      if (s.mode == "overwrite" || s.parent < 0) done = true else cur = s.parent
    }
    val parts = chain.filter(_.files.nonEmpty).map { s =>
      val paths = s.files.map(p => s"$root/$p")
      val f = fs(spark, root)
      val reader =
        if (s.partitionBy.nonEmpty)
          spark.read.option("basePath",
            f.makeQualified(new Path(root, s"data/snap-${s.id}")).toString)
        else spark.read
      reader.parquet(paths: _*)
    }
    if (parts.isEmpty) spark.emptyDataFrame
    // allowMissingColumns: schema evolution — a snapshot written before a
    // column was added reads as null for that column
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  def exists(spark: SparkSession, root: String): Boolean =
    currentSnapshotId(spark, root).isDefined

  /** Every idempotence tag ever committed — ALL manifests are scanned,
    * not just the current chain, because a compaction's overwrite cuts
    * the chain while the compacted-away commits' data lives on in the
    * rewritten snapshot. Manifests are immutable and never deleted, so
    * this is the ground truth for "has unit-of-work X been committed".
    */
  def committedTags(spark: SparkSession, root: String): Set[String] =
    tagRows(spark, root).keySet

  /** tag → committed row count, over ALL manifests (see [[committedTags]]).
    * The latest manifest wins a duplicated tag (cannot happen through the
    * tag-checking writers, but be deterministic anyway).
    */
  def tagRows(spark: SparkSession, root: String): Map[String, Long] = {
    val f = fs(spark, root)
    val mDir = new Path(root, "manifests")
    if (!f.exists(mDir)) Map.empty
    else f.listStatus(mDir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("snap-") && n.endsWith(".json") =>
        n.stripPrefix("snap-").stripSuffix(".json").toLong
      }
      .sorted
      .map(readManifest(spark, root, _))
      .collect { case s if s.tag.isDefined => s.tag.get -> s.rows }
      .toMap
  }

  /** Compact the current file set into ONE overwrite snapshot — the
    * remedy for streaming's small-files problem (every micro-batch append
    * adds a snapshot whose file count is the shuffle parallelism; after k
    * batches a read opens k×p files). Readers are unaffected mid-compact
    * (they hold the old pointer until the atomic flip) and time travel to
    * pre-compaction snapshots still works: old manifests and data files
    * are immutable and never deleted here.
    *
    * @param targetFiles coalesce width of the rewritten data set
    * @return the new snapshot id
    */
  def compact(
      spark: SparkSession,
      root: String,
      partitionBy: Seq[String] = Nil,
      targetFiles: Int = 8): Long = {
    val current = read(spark, root)
    commit(current.coalesce(targetFiles), root, "overwrite", partitionBy)
  }
}
