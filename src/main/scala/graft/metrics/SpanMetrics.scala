package graft.metrics

import graft.core.{Mention, TypeMetrics}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Span-level precision/recall/F1 — the seqeval-micro semantics the
  * reference evaluates with (`evaluate.py:310-337`): a true positive is an
  * EXACT match on (sentence, start, end, entity type); precision = TP/#pred,
  * recall = TP/#gold; per-type rows plus micro / macro / weighted averages
  * mirroring `checkpoints/best_classification_report.txt`.
  *
  * Implemented as joins + one aggregation — no collect on the data path:
  *   tp   = pred ⋈ gold (inner on exact span key) per type
  *   pred = groupBy(type).count ; gold = groupBy(type).count
  * Catalyst gives partial aggregation; the join key includes doc_id so it
  * is high-cardinality and shuffle-balanced.
  */
object SpanMetrics {

  private val keyCols = Seq("doc_id", "span_idx", "start", "end", "entity_type")

  def perType(pred: Dataset[Mention], gold: Dataset[Mention]): Dataset[TypeMetrics] = {
    val spark = pred.sparkSession
    import spark.implicits._

    val p = pred.select(keyCols.map(col): _*).distinct()
    val g = gold.select(keyCols.map(col): _*).distinct()

    val tp = p.join(g, keyCols, "inner").groupBy("entity_type").agg(count(lit(1)).as("tp"))
    val pc = p.groupBy("entity_type").agg(count(lit(1)).as("pred_count"))
    val gc = g.groupBy("entity_type").agg(count(lit(1)).as("gold_count"))

    pc.join(gc, Seq("entity_type"), "full_outer")
      .join(tp, Seq("entity_type"), "left")
      .select(
        col("entity_type"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("pred_count"), lit(0L)).as("pred_count"),
        coalesce(col("gold_count"), lit(0L)).as("gold_count"))
      .withColumn("precision", when(col("pred_count") > 0, col("tp") / col("pred_count")).otherwise(lit(0.0)))
      .withColumn("recall", when(col("gold_count") > 0, col("tp") / col("gold_count")).otherwise(lit(0.0)))
      .withColumn(
        "f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(lit(0.0)))
      .as[TypeMetrics]
  }

  /** Micro-average row (seqeval overall metrics, `evaluate.py:310-313`). */
  def micro(perType: Dataset[TypeMetrics]): TypeMetrics = {
    val spark = perType.sparkSession
    import spark.implicits._
    val (tp, pc, gc) = perType
      .select(sum($"tp"), sum($"pred_count"), sum($"gold_count"))
      .as[(Option[Long], Option[Long], Option[Long])]
      .head() match {
      case (a, b, c) => (a.getOrElse(0L), b.getOrElse(0L), c.getOrElse(0L))
    }
    val p = if (pc > 0) tp.toDouble / pc else 0.0
    val r = if (gc > 0) tp.toDouble / gc else 0.0
    val f1 = if (p + r > 0) 2 * p * r / (p + r) else 0.0
    TypeMetrics("micro", tp, pc, gc, p, r, f1)
  }

  /** Full classification report rows (per-type + micro/macro/weighted
    * averages), mirroring the reference's seqeval `classification_report`
    * (`evaluate.py:318-337`, golden instance
    * `checkpoints/best_classification_report.txt`). The averages operate
    * on the tiny per-type table (≤ #types rows), so driver math is fine.
    */
  def report(per: Dataset[TypeMetrics]): Seq[TypeMetrics] = {
    val rows = per.collect().sortBy(_.entity_type).toSeq
    val mic = micro(per)
    val k = math.max(rows.length, 1)
    val macroRow = TypeMetrics("macro avg", mic.tp, mic.pred_count, mic.gold_count,
      rows.map(_.precision).sum / k, rows.map(_.recall).sum / k, rows.map(_.f1).sum / k)
    val support = rows.map(_.gold_count).sum.toDouble
    def wavg(f: TypeMetrics => Double) =
      if (support == 0) 0.0 else rows.map(r => f(r) * r.gold_count).sum / support
    val weightedRow = TypeMetrics("weighted avg", mic.tp, mic.pred_count, mic.gold_count,
      wavg(_.precision), wavg(_.recall), wavg(_.f1))
    rows :+ mic.copy(entity_type = "micro avg") :+ macroRow :+ weightedRow
  }

  /** Python-compatible fixed-point formatting: `{:.4f}` rounds the exact
    * binary value of the double HALF_EVEN — Java's `%.4f` rounds HALF_UP,
    * which can differ on exact decimal ties, so the renderer goes through
    * BigDecimal explicitly.
    */
  private def py4(x: Double, digits: Int): String =
    new java.math.BigDecimal(x).setScale(digits, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** Byte-for-byte renderer of seqeval's `classification_report(...,
    * digits=4)` text format (golden instance
    * `/root/reference/results/classification_report.txt`, written by the
    * reference's evaluation flow, `evaluate.py:318,392`):
    * `{:>{width}s} ` header/rows with ` {:>9.4f}` metric cells and
    * ` {:>9}` support, a blank line after the header and between the
    * per-class block and the avg block.
    */
  def classificationReportText(rows: Seq[TypeMetrics], digits: Int = 4): String = {
    val avgNames = Set("micro avg", "macro avg", "weighted avg")
    val classes = rows.filterNot(r => avgNames(r.entity_type))
    val avgs = rows.filter(r => avgNames(r.entity_type))
    val width = (classes.map(_.entity_type.length) :+ "weighted avg".length).max
    def pad(s: String, w: Int) = " " * math.max(0, w - s.length) + s
    val sb = new StringBuilder
    sb.append(pad("", width)).append(' ')
    Seq("precision", "recall", "f1-score", "support").foreach(h =>
      sb.append(' ').append(pad(h, 9)))
    sb.append("\n\n")
    def row(r: TypeMetrics): Unit = {
      sb.append(pad(r.entity_type, width)).append(' ')
      Seq(r.precision, r.recall, r.f1).foreach(v =>
        sb.append(' ').append(pad(py4(v, digits), 9)))
      sb.append(' ').append(pad(r.gold_count.toString, 9)).append('\n')
    }
    classes.foreach(row)
    sb.append('\n')
    avgs.foreach(row)
    sb.toString
  }

  /** The reference artifact's trailing overall-metrics line
    * (`总体指标 - 精确率: P, 召回率: R, F1分数: F`). */
  def overallSummaryLine(micro: TypeMetrics, digits: Int = 4): String =
    s"总体指标 - 精确率: ${py4(micro.precision, digits)}, " +
      s"召回率: ${py4(micro.recall, digits)}, F1分数: ${py4(micro.f1, digits)}"

  /** S8: the materialized eval-JSON sink — the nested structure of the
    * reference's `evaluation_results.json` (`evaluate.py:348-381`):
    * model_info / eval_info / metrics.overall / metrics.entity_metrics
    * keyed by entity type with {precision, recall, f1, support}.
    * Deterministic field order (entity types sorted) so the string is
    * oracle-comparable.
    */
  def evalJson(
      per: Seq[TypeMetrics],
      micro: TypeMetrics,
      modelInfo: Seq[(String, String)] = Nil,
      evalInfo: Seq[(String, Long)] = Nil): String = {
    def d(x: Double): String = x.toString
    val mi = modelInfo.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val ei = evalInfo.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val em = per.sortBy(_.entity_type).map { r =>
      s""""${r.entity_type}":{"precision":${d(r.precision)},"recall":${d(r.recall)},"f1":${d(r.f1)},"support":${r.gold_count}}"""
    }.mkString(",")
    s"""{"model_info":{$mi},"eval_info":{$ei},"metrics":{"overall":{"precision":${d(micro.precision)},"recall":${d(micro.recall)},"f1":${d(micro.f1)}},"entity_metrics":{$em}}}"""
  }

  /** Write the eval JSON to a file (driver-side, like the reference's
    * single-file writer).
    */
  def writeEvalJson(path: String, json: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)

  /** Token-level confusion matrix over entity types with BIO prefix
    * stripped and `O` included (`evaluate.py:472-493`): rows of
    * (gold_type, pred_type, count).
    */
  def confusion(pairs: DataFrame): DataFrame = {
    // pairs: (gold_tag: string, pred_tag: string) per kept token position
    val strip = (c: String) =>
      when(col(c) === "O", lit("O")).otherwise(expr(s"substring($c, 3)"))
    pairs
      .select(strip("gold_tag").as("gold_type"), strip("pred_tag").as("pred_type"))
      .groupBy("gold_type", "pred_type")
      .agg(count(lit(1)).as("n"))
  }
}
