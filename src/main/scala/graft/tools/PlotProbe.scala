package graft.tools
object PlotProbe {
  def main(args: Array[String]): Unit = {
    import graft.sinks.Plots
    val curves = Plots.trainingCurvesSvg(Seq((1, 2.31, 0.41), (2, 1.12, 0.66), (3, 0.81, 0.79), (4, 0.62, 0.80)))
    val rows = Seq(
      graft.core.TypeMetrics("Anatomical", 793, 1017, 944, 0.7797, 0.84, 0.8088),
      graft.core.TypeMetrics("Diseases", 354, 431, 441, 0.8213, 0.8027, 0.8119),
      graft.core.TypeMetrics("Drug", 156, 169, 173, 0.9231, 0.9017, 0.9123),
      graft.core.TypeMetrics("Image", 80, 98, 93, 0.8163, 0.8602, 0.8377))
    val conf = Seq(("Anatomical","Anatomical",793L),("Anatomical","Diseases",21L),("Anatomical","O",130L),
      ("Diseases","Diseases",354L),("Diseases","Anatomical",18L),("Diseases","O",69L),
      ("O","Anatomical",88L),("O","Diseases",35L),("O","O",9000L))
    val dist = Seq(("O", 252000L), ("B-Anatomical", 9000L), ("I-Anatomical", 21000L), ("B-Diseases", 4300L), ("I-Diseases", 12000L))
    val html = new StringBuilder("<html><body style='margin:16px;background:#eee'>")
    Seq("curves" -> curves, "bars" -> Plots.entityMetricsSvg(rows),
      "heat" -> Plots.confusionHeatmapSvg(conf), "dist" -> Plots.labelDistributionSvg(dist))
      .foreach { case (n, svg) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/plot_$n.svg"), svg)
        html.append(s"<div style='margin-bottom:12px'>$svg</div>")
      }
    html.append("</body></html>")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plots.html"), html.toString)
    println("wrote /tmp/plots.html")
  }
}
