package graft.sinks

import graft.core.TypeMetrics

/** S11 — plot sinks. The reference renders training curves, per-entity
  * metric bars, a confusion-matrix heatmap, and label-distribution bars
  * as matplotlib PNGs (`train_enhanced.py:454-473`,
  * `evaluate.py:421-465,495-517`, `label_statistics.py:42-71`). The
  * primary analog is deterministic, self-contained SVG — a text artifact
  * any browser renders, byte-stable for golden tests, derived from the
  * SAME oracle-checked metric tables (which remain the primary,
  * queryable output; every figure here is a rendering of one of them, so
  * the "table view" of each chart is a first-class query). [[Png]]
  * rasterizes these SVGs to real .png files through the JDK's headless
  * raster (r5) — one chart logic, two encodings.
  *
  * Design rules applied (and deliberately boring): one axis per panel —
  * the reference's loss/F1 pair renders as two small multiples, never a
  * dual-axis chart; categorical hues in fixed order (blue, orange, aqua)
  * with a legend for multi-series panels; magnitude uses one blue hue
  * light→dark; grids recessive; text in ink tokens, never series colors.
  */
object Plots {

  // fixed-order categorical slots + ink/surface tokens (light mode)
  private val Series = Vector("#2a78d6", "#eb6834", "#1baf7a")
  private val Surface = "#fcfcfb"
  private val Ink = "#0b0b0b"
  private val Ink2 = "#52514e"
  private val Grid = "#e4e3df"

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def fmt(x: Double): String = f"$x%.4f".reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse

  private def svgOpen(w: Int, h: Int, title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" font-family="sans-serif">
       |<rect width="$w" height="$h" fill="$Surface"/>
       |<text x="16" y="24" font-size="15" font-weight="bold" fill="$Ink">${esc(title)}</text>""".stripMargin

  /** Two small-multiple line panels: average loss and F1 per epoch —
    * the analog of the reference's side-by-side training subplots
    * (`train_enhanced.py:454-473`). One y-axis per panel, single series
    * each (panel titles name them; no legend needed).
    */
  def trainingCurvesSvg(history: Seq[(Int, Double, Double)]): String = {
    require(history.nonEmpty, "empty history")
    val w = 720; val h = 300
    val sb = new StringBuilder(svgOpen(w, h, "Training loss and F1 by epoch"))
    def panel(x0: Int, title: String, values: Seq[Double], color: String): Unit = {
      val pw = 300; val ph = 200; val y0 = 60
      val vmax = math.max(values.max, 1e-9)
      val vmin = math.min(values.min, 0.0)
      val span = math.max(vmax - vmin, 1e-9)
      def px(i: Int) = x0 + (if (values.size == 1) pw / 2.0 else i.toDouble * pw / (values.size - 1))
      def py(v: Double) = y0 + ph - (v - vmin) / span * ph
      sb.append(s"""\n<text x="$x0" y="${y0 - 12}" font-size="12" fill="$Ink2">${esc(title)}</text>""")
      // recessive grid: 4 horizontal lines + min/max tick labels
      (0 to 4).foreach { g =>
        val gy = y0 + ph * g / 4.0
        sb.append(s"""\n<line x1="$x0" y1="$gy" x2="${x0 + pw}" y2="$gy" stroke="$Grid" stroke-width="1"/>""")
      }
      sb.append(s"""\n<text x="${x0 - 4}" y="${py(vmax) + 4}" font-size="10" text-anchor="end" fill="$Ink2">${fmt(vmax)}</text>""")
      sb.append(s"""\n<text x="${x0 - 4}" y="${py(vmin) + 4}" font-size="10" text-anchor="end" fill="$Ink2">${fmt(vmin)}</text>""")
      val pts = values.indices.map(i => f"${px(i)}%.1f,${py(values(i))}%.1f").mkString(" ")
      sb.append(s"""\n<polyline points="$pts" fill="none" stroke="$color" stroke-width="2"/>""")
      values.indices.foreach { i =>
        sb.append(s"""\n<circle cx="${px(i)}" cy="${py(values(i))}" r="3" fill="$color"/>""")
      }
      // x tick labels: first and last epoch
      sb.append(s"""\n<text x="$x0" y="${y0 + ph + 16}" font-size="10" fill="$Ink2">epoch ${history.head._1}</text>""")
      sb.append(s"""\n<text x="${x0 + pw}" y="${y0 + ph + 16}" font-size="10" text-anchor="end" fill="$Ink2">${history.last._1}</text>""")
    }
    panel(60, "Average loss", history.map(_._2), Series(0))
    panel(420, "F1 (dev)", history.map(_._3), Series(0))
    sb.append("\n</svg>\n").toString
  }

  /** Grouped P/R/F1 bars per entity type — the analog of the reference's
    * `entity_performance.png` (`evaluate.py:421-465`). Three fixed-order
    * series with a legend; 2px surface gaps between bars.
    */
  def entityMetricsSvg(rows: Seq[TypeMetrics]): String = {
    require(rows.nonEmpty, "no metric rows")
    val names = Seq("precision", "recall", "f1")
    val w = math.max(420, 80 + rows.size * 96); val h = 320
    val y0 = 60; val ph = 200
    val sb = new StringBuilder(svgOpen(w, h, "Entity-type performance"))
    // legend (text in ink tokens, swatch carries identity)
    names.zipWithIndex.foreach { case (n, i) =>
      val lx = w - 260 + i * 86
      sb.append(s"""\n<rect x="$lx" y="14" width="10" height="10" fill="${Series(i)}"/>""")
      sb.append(s"""\n<text x="${lx + 14}" y="23" font-size="11" fill="$Ink2">$n</text>""")
    }
    (0 to 4).foreach { g =>
      val gy = y0 + ph * g / 4.0
      sb.append(s"""\n<line x1="56" y1="$gy" x2="${w - 16}" y2="$gy" stroke="$Grid" stroke-width="1"/>""")
      sb.append(s"""\n<text x="50" y="${gy + 4}" font-size="10" text-anchor="end" fill="$Ink2">${fmt(1.0 - g / 4.0)}</text>""")
    }
    rows.zipWithIndex.foreach { case (r, gi) =>
      val gx = 72 + gi * 96
      Seq(r.precision, r.recall, r.f1).zipWithIndex.foreach { case (v, si) =>
        val bw = 22
        val bx = gx + si * (bw + 2) // 2px surface gap between adjacent bars
        val bh = math.max(v, 0.0).min(1.0) * ph
        val by = y0 + ph - bh
        sb.append(
          s"""\n<rect x="$bx" y="$by" width="$bw" height="${f"$bh%.1f"}" rx="2" fill="${Series(si)}"/>""")
      }
      sb.append(s"""\n<text x="${gx + 34}" y="${y0 + ph + 16}" font-size="10" text-anchor="middle" fill="$Ink">${esc(r.entity_type)}</text>""")
    }
    sb.append("\n</svg>\n").toString
  }

  /** Confusion-matrix heatmap — the analog of the reference's
    * `confusion_matrix.png` (`evaluate.py:495-517`). Magnitude = one
    * blue hue light→dark; 2px gaps between cells; every cell direct-
    * labeled with its count (ink switches for contrast on dark cells).
    */
  def confusionHeatmapSvg(cells: Seq[(String, String, Long)]): String = {
    require(cells.nonEmpty, "no confusion cells")
    val labels = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val byKey = cells.map { case (g, p, n) => (g, p) -> n }.toMap
    val vmax = math.max(cells.map(_._3).max, 1L)
    val cs = 46 // cell size
    val x0 = 120; val y0 = 70
    val w = x0 + labels.size * cs + 24
    val h = y0 + labels.size * cs + 24
    def ramp(t: Double): String = {
      // one hue, light→dark, lightness-monotone: #eaf2fc → #1b4f8f
      def lerp(a: Int, b: Int) = math.round(a + (b - a) * t).toInt
      f"#${lerp(0xea, 0x1b)}%02x${lerp(0xf2, 0x4f)}%02x${lerp(0xfc, 0x8f)}%02x"
    }
    val sb = new StringBuilder(svgOpen(w, h, "Confusion matrix (gold × predicted)"))
    labels.zipWithIndex.foreach { case (l, i) =>
      sb.append(s"""\n<text x="${x0 - 8}" y="${y0 + i * cs + cs / 2 + 4}" font-size="10" text-anchor="end" fill="$Ink">${esc(l)}</text>""")
      sb.append(s"""\n<text x="${x0 + i * cs + cs / 2}" y="${y0 - 8}" font-size="10" text-anchor="middle" fill="$Ink">${esc(l)}</text>""")
    }
    labels.zipWithIndex.foreach { case (g, r) =>
      labels.zipWithIndex.foreach { case (p, c) =>
        val n = byKey.getOrElse((g, p), 0L)
        val t = if (n == 0) 0.0 else math.log1p(n.toDouble) / math.log1p(vmax.toDouble)
        val fill = ramp(t)
        val ink = if (t > 0.55) "#ffffff" else Ink
        val cx = x0 + c * cs; val cy = y0 + r * cs
        sb.append(s"""\n<rect x="${cx + 1}" y="${cy + 1}" width="${cs - 2}" height="${cs - 2}" fill="$fill"/>""")
        sb.append(s"""\n<text x="${cx + cs / 2}" y="${cy + cs / 2 + 4}" font-size="10" text-anchor="middle" fill="$ink">$n</text>""")
      }
    }
    sb.append("\n</svg>\n").toString
  }

  /** Label-distribution bars — the analog of `label_statistics.py:42-71`.
    * Single series (one hue, no legend).
    */
  def labelDistributionSvg(rows: Seq[(String, Long)]): String = {
    require(rows.nonEmpty, "no label rows")
    val sorted = rows.sortBy { case (l, n) => (-n, l) }
    val vmax = math.max(sorted.head._2, 1L)
    val bh = 18
    val x0 = 130; val pw = 420
    val h = 56 + sorted.size * (bh + 4)
    val w = x0 + pw + 90
    val sb = new StringBuilder(svgOpen(w, h, "Label distribution"))
    sorted.zipWithIndex.foreach { case ((label, n), i) =>
      val y = 44 + i * (bh + 4)
      val bw = n.toDouble / vmax * pw
      sb.append(s"""\n<text x="${x0 - 8}" y="${y + bh - 5}" font-size="11" text-anchor="end" fill="$Ink">${esc(label)}</text>""")
      sb.append(s"""\n<rect x="$x0" y="$y" width="${f"$bw%.1f"}" height="$bh" rx="2" fill="${Series(0)}"/>""")
      sb.append(s"""\n<text x="${x0 + bw + 6}" y="${y + bh - 5}" font-size="10" fill="$Ink2">$n</text>""")
    }
    sb.append("\n</svg>\n").toString
  }
}
