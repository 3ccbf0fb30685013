package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExprProbe extends AnyFunSuite {
  test("probe") {
    lazy val spark = SparkTest.spark
    spark.range(1).count()
    val e = org.apache.spark.sql.GraftSqlBridge.expression(col("k") >= 250L && col("x") === "a")
    println("PROBE: " + e.getClass.getName + " :: " + e)
    e.children.foreach(c => println("  child " + c.getClass.getName + " :: " + c))
  }
}
