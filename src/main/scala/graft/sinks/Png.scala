package graft.sinks

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage

/** PNG rendition of the S11 figures — rasterized FROM the [[Plots]] SVG
  * strings, not drawn independently, so the PNG can never drift from the
  * golden-tested SVG (one chart logic, two encodings).
  *
  * This is NOT a general SVG renderer: it rasterizes exactly the element
  * vocabulary Plots emits — `rect` (incl. `rx`), `line`, `polyline`,
  * `text` (`font-size`, `font-weight`, `text-anchor`, `fill`) — painted
  * in document order on the JDK's headless raster and encoded with the
  * JDK's own ImageIO PNG writer (present in this runtime: the earlier
  * "no image codecs" claim only holds for reproducing matplotlib's exact
  * bytes, which stays impossible by construction — these PNGs are the
  * same figures, different encoder).
  */
object Png {

  private val Attr = """([a-zA-Z-]+)="([^"]*)"""".r
  // lazy attr body up to an optional self-closing slash: attribute
  // VALUES may contain '/' (the xmlns URL), so '/' cannot be excluded
  private val Elem = """<(rect|line|polyline|text|svg)\b([^>]*?)(/?)>([^<]*)""".r

  private def unesc(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"").replace("&amp;", "&")

  private def colorOf(s: String): Color =
    if (s == "none") null
    else new Color(Integer.parseInt(s.stripPrefix("#"), 16))

  /** Rasterize a Plots SVG to PNG bytes at `scale`× resolution. */
  def fromPlotSvg(svg: String, scale: Int = 2): Array[Byte] = {
    var width = 640
    var height = 480
    // first pass: canvas size from the <svg> element
    for (m <- Elem.findAllMatchIn(svg) if m.group(1) == "svg") {
      val attrs = Attr.findAllMatchIn(m.group(2)).map(a => a.group(1) -> a.group(2)).toMap
      width = attrs.get("width").map(_.toInt).getOrElse(width)
      height = attrs.get("height").map(_.toInt).getOrElse(height)
    }
    val img = new BufferedImage(width * scale, height * scale, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.scale(scale.toDouble, scale.toDouble)
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)
      for (m <- Elem.findAllMatchIn(svg) if m.group(1) != "svg") {
        val attrs = Attr.findAllMatchIn(m.group(2)).map(a => a.group(1) -> a.group(2)).toMap
        def d(k: String, dflt: Double = 0.0) = attrs.get(k).map(_.toDouble).getOrElse(dflt)
        m.group(1) match {
          case "rect" =>
            val c = colorOf(attrs.getOrElse("fill", "#000000"))
            if (c != null) {
              g.setColor(c)
              val (x, y, w, h) = (d("x"), d("y"), d("width"), d("height"))
              val rx = d("rx")
              if (rx > 0)
                g.fill(new java.awt.geom.RoundRectangle2D.Double(x, y, w, h, rx * 2, rx * 2))
              else g.fill(new java.awt.geom.Rectangle2D.Double(x, y, w, h))
            }
          case "line" =>
            g.setColor(colorOf(attrs.getOrElse("stroke", "#000000")))
            g.setStroke(new BasicStroke(d("stroke-width", 1.0).toFloat))
            g.draw(new java.awt.geom.Line2D.Double(d("x1"), d("y1"), d("x2"), d("y2")))
          case "polyline" =>
            val pts = attrs.getOrElse("points", "").split("\\s+").filter(_.nonEmpty)
              .map { p => val Array(x, y) = p.split(","); (x.toDouble, y.toDouble) }
            if (pts.length >= 2) {
              g.setColor(colorOf(attrs.getOrElse("stroke", "#000000")))
              g.setStroke(new BasicStroke(
                d("stroke-width", 1.0).toFloat, BasicStroke.CAP_ROUND, BasicStroke.JOIN_ROUND))
              val path = new java.awt.geom.Path2D.Double()
              path.moveTo(pts.head._1, pts.head._2)
              pts.tail.foreach { case (x, y) => path.lineTo(x, y) }
              g.draw(path)
            }
          case "text" =>
            val size = d("font-size", 12.0).toInt
            val style = if (attrs.get("font-weight").contains("bold")) Font.BOLD else Font.PLAIN
            g.setFont(new Font(Font.SANS_SERIF, style, size))
            g.setColor(colorOf(attrs.getOrElse("fill", "#000000")))
            val content = unesc(m.group(4).trim)
            if (content.nonEmpty) {
              val fm = g.getFontMetrics
              val tw = fm.stringWidth(content)
              val x = attrs.getOrElse("text-anchor", "start") match {
                case "middle" => d("x") - tw / 2.0
                case "end" => d("x") - tw
                case _ => d("x")
              }
              g.drawString(content, x.toFloat, d("y").toFloat)
            }
          case _ =>
        }
      }
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def writePng(svg: String, path: java.nio.file.Path, scale: Int = 2): Unit =
    java.nio.file.Files.write(path, fromPlotSvg(svg, scale))
}
