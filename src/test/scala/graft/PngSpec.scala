package graft

import graft.core.TypeMetrics
import graft.sinks.{Plots, Png}
import org.scalatest.funsuite.AnyFunSuite

/** S11 PNG rendition: the figures rasterize FROM the golden-tested SVG
  * strings through the JDK's headless raster + ImageIO — valid PNG
  * bytes, correct canvas geometry, the Plots surface color actually
  * painted. (Byte-identity with the reference's matplotlib PNGs remains
  * impossible by construction; these are the same figures re-encoded.)
  */
class PngSpec extends AnyFunSuite {

  private def rows = Seq(
    TypeMetrics("Diseases", 8, 10, 12, 0.8, 0.667, 0.727),
    TypeMetrics("Drug", 5, 6, 5, 0.833, 1.0, 0.909))

  private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    // PNG magic
    assert(bytes.length > 8)
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
  }

  test("all four figure families rasterize to decodable PNGs at 2x the SVG canvas") {
    val svgs = Seq(
      Plots.entityMetricsSvg(rows),
      Plots.confusionHeatmapSvg(Seq(("Diseases", "Diseases", 9L), ("Diseases", "O", 2L), ("O", "O", 90L))),
      Plots.labelDistributionSvg(Seq(("B-Diseases", 12L), ("I-Diseases", 30L), ("O", 500L))),
      Plots.trainingCurvesSvg(Seq((1, 1.9, 0.55), (2, 1.2, 0.68), (3, 0.8, 0.74))))
    svgs.foreach { svg =>
      val Some(w) = """width="(\d+)"""".r.findFirstMatchIn(svg).map(_.group(1).toInt)
      val Some(h) = """height="(\d+)"""".r.findFirstMatchIn(svg).map(_.group(1).toInt)
      val img = decode(Png.fromPlotSvg(svg, scale = 2))
      assert(img.getWidth == w * 2 && img.getHeight == h * 2,
        s"canvas ${img.getWidth}x${img.getHeight} != ${w * 2}x${h * 2}")
      // the full-canvas surface rect painted first: the corner pixel is
      // the Plots surface token (#fcfcfb), not the raster's default
      assert((img.getRGB(4, 4) & 0xFFFFFF) == 0xFCFCFB,
        f"surface pixel ${img.getRGB(4, 4) & 0xFFFFFF}%06x")
    }
  }

  test("rasterization is deterministic (byte-stable for golden use)") {
    val svg = Plots.labelDistributionSvg(Seq(("B-X", 3L), ("O", 7L)))
    val a = Png.fromPlotSvg(svg)
    val b = Png.fromPlotSvg(svg)
    assert(java.util.Arrays.equals(a, b))
  }

  test("series color lands where a bar is drawn") {
    val svg = Plots.labelDistributionSvg(Seq(("B-X", 100L)))
    // find the first bar rect the SVG declares and probe its center
    val rect = """<rect x="(\d+)" y="(\d+)" width="([0-9.]+)" height="(\d+)" rx="2" fill="#2a78d6"/>""".r
    val m = rect.findFirstMatchIn(svg).getOrElse(fail(s"no bar rect in:\n$svg"))
    val (x, y, w, h) = (m.group(1).toInt, m.group(2).toInt, m.group(3).toDouble, m.group(4).toInt)
    val img = decode(Png.fromPlotSvg(svg, scale = 2))
    val px = img.getRGB((x + w / 2).toInt * 2, (y + h / 2) * 2) & 0xFFFFFF
    assert(px == 0x2A78D6, f"bar center pixel $px%06x != series blue")
  }
}
