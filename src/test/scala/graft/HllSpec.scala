package graft

import graft.core.{Hashing, Hll}
import graft.functions.{HllDistinct, Registry}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the deterministic HLL count-distinct sketch. */
class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("kernel: estimate within 3% at 100k distinct, near-exact in the linear-counting range") {
    val big = Hll.newRegisters(Hll.DefaultP)
    (0 until 100000).foreach(i => Hll.addString(big, s"value-$i"))
    val est = Hll.estimate(big)
    assert(math.abs(est - 100000) / 100000.0 < 0.03, s"est=$est")

    val small = Hll.newRegisters(Hll.DefaultP)
    (0 until 500).foreach(i => Hll.addString(small, s"v$i"))
    val estS = Hll.estimate(small)
    assert(math.abs(estS - 500) / 500.0 < 0.02, s"est=$estS") // linear counting
    // duplicates do not move the registers
    val dup = Hll.newRegisters(Hll.DefaultP)
    (0 until 500).foreach(i => Hll.addString(dup, s"v${i % 100}"))
    val only = Hll.newRegisters(Hll.DefaultP)
    (0 until 100).foreach(i => Hll.addString(only, s"v$i"))
    assert(dup.sameElements(only))
  }

  test("kernel: chunked merge is bit-identical to the sequential build") {
    val values = (0 until 20000).map(i => s"tok-${Hashing.mix64(i.toLong)}")
    val seq = Hll.newRegisters(Hll.DefaultP)
    values.foreach(Hll.addString(seq, _))
    val merged = Hll.newRegisters(Hll.DefaultP)
    values.grouped(2857).foreach { chunk =>
      val part = Hll.newRegisters(Hll.DefaultP)
      chunk.foreach(Hll.addString(part, _))
      Hll.merge(merged, part)
    }
    assert(merged.sameElements(seq))
    assert(Hll.estimateLong(merged) == Hll.estimateLong(seq))
  }

  test("aggregate: partition-independent and equal to the sequential kernel") {
    import spark.implicits._
    // 3 groups with overlapping values and heavy duplication
    val rows = (0 until 30000).map { i =>
      (s"g${i % 3}", s"val-${i % 4000}")
    }
    val df = rows.toDF("grp", "v")
    def run(d: org.apache.spark.sql.DataFrame): Map[String, Long] =
      d.groupBy("grp").agg(HllDistinct.hll_distinct(col("v")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val regs = Hll.newRegisters(Hll.DefaultP)
      vs.foreach { case (_, v) => Hll.addString(regs, v) }
      g -> Hll.estimateLong(regs)
    }
    assert(run(df) == expected)
    assert(run(df.repartition(13, col("v"))) == expected) // values split across tasks
    assert(run(df.repartition(1)) == expected)
  }

  test("SQL registration: hll_distinct with and without an explicit p literal") {
    import spark.implicits._
    Registry.registerAll(spark)
    (0 until 1000).map(i => s"x$i").toDF("v").createOrReplaceTempView("hll_in")
    val est = spark.sql("SELECT hll_distinct(v) FROM hll_in").head().getLong(0)
    val regs = Hll.newRegisters(Hll.DefaultP)
    (0 until 1000).foreach(i => Hll.addString(regs, s"x$i"))
    assert(est == Hll.estimateLong(regs))
    // coarser sketch via the p argument: matches the kernel at p=8 too
    val est8 = spark.sql("SELECT hll_distinct(v, 8) FROM hll_in").head().getLong(0)
    val regs8 = Hll.newRegisters(8)
    (0 until 1000).foreach(i => Hll.addString(regs8, s"x$i"))
    assert(est8 == Hll.estimateLong(regs8))
  }
}
