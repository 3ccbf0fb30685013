package graft

import graft.tables.{ConcurrentCommitException, Icebergish}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 hardening: vacuum interleaved with in-flight commits (r4
  * VERDICT next-step #9). The sweep must never remove a file any
  * installed-or-about-to-install manifest references; only aged
  * (crash-leftover) garbage may go.
  */
class Round5Spec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("vacuum racing live committers never removes a referenced or in-flight file") {
    import spark.implicits._
    val root = tmpDir("iceberg_vacuum_race")
    val threads = 3
    val opsPerThread = 4
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val vacuumErrors = new java.util.concurrent.atomic.AtomicInteger(0)
    val vacuumRemoved = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)

    // plant one AGED unreferenced stage (a crashed writer from "an hour
    // ago") and one FRESH one (an in-flight writer) before the storm
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(root, "data/snap-7-oldcrash"))
    f.create(new org.apache.hadoop.fs.Path(root, "data/snap-7-oldcrash/part-0.parquet"), true).close()
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(root, "data/snap-7-oldcrash"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600_000L))
    f.mkdirs(new org.apache.hadoop.fs.Path(root, "data/snap-8-inflight"))
    f.create(new org.apache.hadoop.fs.Path(root, "data/snap-8-inflight/part-0.parquet"), true).close()

    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads + 1)
    try {
      val vacuumFut = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          while (!stop.get()) {
            try Icebergish.vacuum(spark, root).foreach(vacuumRemoved.add)
            catch { case _: Exception => vacuumErrors.incrementAndGet() }
            Thread.sleep(20)
          }
      })
      val futs = (0 until threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            (0 until opsPerThread).foreach { i =>
              val df = Seq((t * 1000 + i, s"v$t-$i")).toDF("id", "v")
              var done = false
              while (!done) {
                try { Icebergish.commit(df, root, statsColumns = Seq("id")); done = true }
                catch { case _: ConcurrentCommitException => losses.incrementAndGet() }
              }
            }
        })
      }
      futs.foreach(_.get())
      stop.set(true)
      vacuumFut.get()
    } finally pool.shutdown()

    assert(vacuumErrors.get() == 0, s"vacuum threw ${vacuumErrors.get()} times")
    // every committed row is readable — no in-flight stage was swept
    val got = Icebergish.read(spark, root).select("id").as[Int].collect().toSet
    assert(got == (for (t <- 0 until threads; i <- 0 until opsPerThread) yield t * 1000 + i).toSet,
      s"rows lost to the vacuum race: ${got.size}")
    // every file the live chain references exists on disk
    val id = Icebergish.currentSnapshotId(spark, root).get
    (0L to id).foreach { sid =>
      Icebergish.readManifest(spark, root, sid).files.foreach { rel =>
        assert(f.exists(new org.apache.hadoop.fs.Path(root, rel)),
          s"referenced file missing after vacuum: $rel")
      }
    }
    // the aged crash leftover was collected; the fresh in-flight stage
    // survived the whole storm (grace period)
    assert(vacuumRemoved.contains("snap-7-oldcrash"))
    assert(!vacuumRemoved.contains("snap-8-inflight"))
    assert(f.exists(new org.apache.hadoop.fs.Path(root, "data/snap-8-inflight")))
    // zone maps written under concurrency still prune
    val (_, skipped) = Icebergish.pruneFiles(spark, root, col("id") === (threads * 1000))
    assert(skipped.nonEmpty, "stats written by racing commits should prune")
    info(s"losses retried: ${losses.get()}, vacuum removals: $vacuumRemoved")
  }
}
