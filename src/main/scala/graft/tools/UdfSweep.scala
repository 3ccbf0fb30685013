package graft.tools
object UdfSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        if (p.contains("ScalaUDF")) println(s"UDF  $name")
      } catch { case e: Throwable => println(s"ERR  $name: ${e.getMessage.take(80)}") }
      spark.catalog.clearCache()
    }
    println("sweep done")
    spark.stop()
  }
}
