package graft.pipeline

import graft.SparkSpec

class FiguresSpec extends SparkSpec {

  describe("Figures (S14 — pheatmap/ggplot sink as deterministic SVG)") {

    def accuracyMatrix() = {
      import spark.implicits._
      Seq(
        ("CNC_AE", "ds1", 0.95), ("CNC_AE", "ds2", 0.70),
        ("MOCSS", "ds1", 0.40), ("MOCSS", "ds2", Double.NaN),
        ("JISAE", "ds1", 0.95), ("JISAE", "ds2", 0.10))
        .toDF("arch", "dataset", "acc")
    }

    it("renders the arch×dataset accuracy heatmap with one rect per cell") {
      val svg = Figures.heatmapSvg(accuracyMatrix(), "arch", "dataset",
        "acc", title = "NB accuracy")
      assert(svg.startsWith("<svg "))
      assert(svg.contains("NB accuracy"))
      // 3 archs × 2 datasets = 6 cells
      assert("<rect ".r.findAllIn(svg).length == 6)
      // NaN cell renders grey with the NA sentinel
      assert(svg.contains("rgb(220,220,220)") && svg.contains(">NA</text>"))
      // all row/col labels present
      Seq("CNC_AE", "MOCSS", "JISAE", "ds1", "ds2")
        .foreach(l => assert(svg.contains(l)))
    }

    it("maps higher values to darker fills (monotone color ramp)") {
      val svg = Figures.heatmapSvg(accuracyMatrix(), "arch", "dataset", "acc")
      def fillOf(label: String): String = {
        // the <text> carrying the value immediately follows its <rect>
        val i = svg.indexOf(s">$label</text>")
        assert(i >= 0, s"cell $label not rendered")
        val pre = svg.substring(0, i)
        val j = pre.lastIndexOf("fill=\"rgb(")
        pre.substring(j + 6, pre.indexOf("\"", j + 6))
      }
      def lum(fill: String): Int =
        "\\d+".r.findAllIn(fill).map(_.toInt).sum
      // 0.10 (min) → lightest, 0.40 mid, 0.95 (max) darkest
      assert(lum(fillOf("0.1000")) > lum(fillOf("0.4000")))
      assert(lum(fillOf("0.4000")) > lum(fillOf("0.9500")))
    }

    it("is deterministic and writes a readable file") {
      val df = accuracyMatrix()
      val a = Figures.heatmapSvg(df, "arch", "dataset", "acc")
      val b = Figures.heatmapSvg(df, "arch", "dataset", "acc")
      assert(a == b)
      val path = java.nio.file.Files.createTempDirectory("graft-fig")
        .resolve("heatmap.svg").toString
      Figures.writeSvg(a, path)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))) == a)
    }

    it("renders per-arch mean bars scaled to the max value") {
      import spark.implicits._
      val means = Seq(("CNC_AE", 0.825), ("JISAE", 0.525), ("MOCSS", 0.40))
        .toDF("arch", "mean_acc")
      val svg = Figures.barChartSvg(means, "arch", "mean_acc",
        title = "mean accuracy")
      assert("<rect ".r.findAllIn(svg).length == 3)
      val widths = "<rect [^/]*width=\"(\\d+)\"".r
        .findAllMatchIn(svg).map(_.group(1).toInt).toSeq
      // label-sorted: CNC_AE, JISAE, MOCSS — widths proportional to value
      assert(widths.length == 3)
      assert(widths(0) == 360)                       // max → full bar
      assert(math.abs(widths(1) - 360.0 * 0.525 / 0.825) <= 1)
      assert(math.abs(widths(2) - 360.0 * 0.400 / 0.825) <= 1)
    }
  }
}
