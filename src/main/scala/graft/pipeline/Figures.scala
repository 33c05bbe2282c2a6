package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** S14 — figure sink for the evaluation notebook's heatmaps and bar
  * charts (Evaluation_Auxiliary/AE_results.ipynb cells 20, 34, 36, 43,
  * 45, 61, 132, 135: `pheatmap` over the 8×20 accuracy matrices, ggplot
  * bars over per-architecture means).
  *
  * The reference renders through R; this engine renders the same
  * aggregated tables as self-contained deterministic SVG text — no
  * plotting library, byte-identical output for identical input, so the
  * sink is spec-testable like any other operator. The DISTRIBUTED work
  * is the aggregation feeding the figure (§2.5 A16/A3 — pivot to the
  * k×arch matrix); rendering a k×k matrix is a SURVEY-sanctioned
  * driver-side finish, exactly like the k×k Hungarian/contingency
  * collects.
  *
  * Color ramp: linear white→blue over the value range (pheatmap's
  * default continuous scale shape); NaN cells render grey with an 'NA'
  * label, matching `format_cell`'s sentinel.
  */
object Figures {

  private val Cell = 48
  private val Margin = 96

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def fmt(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.4f"

  /** White→blue ramp; t in [0,1]. Deterministic integer RGB. */
  private def ramp(t: Double): String = {
    val tt = math.max(0.0, math.min(1.0, t))
    val r = math.round(255 - 188 * tt)
    val g = math.round(255 - 172 * tt)
    val b = math.round(255 - 78 * tt)
    s"rgb($r,$g,$b)"
  }

  /** Render a long-form (row, col, value) frame as a heatmap grid.
    * Rows/cols are label-sorted for determinism; missing (row, col)
    * combinations and NaNs render as grey 'NA' cells. The frame must be
    * a small aggregate (k×k cells — a 100 TB input reaches this sink
    * only through a groupBy that reduces it to one cell per group). */
  def heatmapSvg(df: DataFrame, rowCol: String, colCol: String,
      valueCol: String, title: String = ""): String = {
    val cells = df.select(rowCol, colCol, valueCol).collect()
      .map(r => ((r.get(0).toString, r.get(1).toString),
        if (r.isNullAt(2)) Double.NaN
        else r.get(2).asInstanceOf[Number].doubleValue()))
      .toMap
    val rows = cells.keys.map(_._1).toSeq.distinct.sorted
    val cols = cells.keys.map(_._2).toSeq.distinct.sorted
    val vals = cells.values.filterNot(_.isNaN)
    val (lo, hi) =
      if (vals.isEmpty) (0.0, 1.0) else (vals.min, vals.max)
    val span = if (hi > lo) hi - lo else 1.0

    val w = Margin + cols.length * Cell + 16
    val h = Margin + rows.length * Cell + 16
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">"""
    sb ++= "\n"
    if (title.nonEmpty)
      sb ++= s"""<text x="${Margin}" y="20" font-size="14">${esc(title)}</text>""" + "\n"
    cols.zipWithIndex.foreach { case (c, j) =>
      val x = Margin + j * Cell + Cell / 2
      sb ++= s"""<text x="$x" y="${Margin - 8}" font-size="10" text-anchor="middle">${esc(c)}</text>""" + "\n"
    }
    rows.zipWithIndex.foreach { case (rl, i) =>
      val y = Margin + i * Cell + Cell / 2 + 4
      sb ++= s"""<text x="${Margin - 8}" y="$y" font-size="10" text-anchor="end">${esc(rl)}</text>""" + "\n"
    }
    rows.zipWithIndex.foreach { case (rl, i) =>
      cols.zipWithIndex.foreach { case (cl, j) =>
        val x = Margin + j * Cell
        val y = Margin + i * Cell
        val v = cells.getOrElse((rl, cl), Double.NaN)
        val (fill, label) =
          if (v.isNaN) ("rgb(220,220,220)", "NA")
          else (ramp((v - lo) / span), fmt(v))
        sb ++= s"""<rect x="$x" y="$y" width="$Cell" height="$Cell" fill="$fill" stroke="rgb(255,255,255)"/>""" + "\n"
        sb ++= s"""<text x="${x + Cell / 2}" y="${y + Cell / 2 + 4}" font-size="9" text-anchor="middle">${esc(label)}</text>""" + "\n"
      }
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Render a (label, value) frame as a horizontal bar chart,
    * label-sorted. Same small-aggregate contract as [[heatmapSvg]]. */
  def barChartSvg(df: DataFrame, labelCol: String, valueCol: String,
      title: String = ""): String = {
    val bars = df.select(labelCol, valueCol).collect()
      .map(r => (r.get(0).toString,
        r.get(1).asInstanceOf[Number].doubleValue()))
      .sortBy(_._1)
    val vmax = if (bars.isEmpty) 1.0 else math.max(bars.map(_._2).max, 1e-12)
    val barW = 360
    val w = Margin + barW + 80
    val h = Margin / 2 + bars.length * Cell + 16
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">"""
    sb ++= "\n"
    if (title.nonEmpty)
      sb ++= s"""<text x="${Margin}" y="20" font-size="14">${esc(title)}</text>""" + "\n"
    bars.zipWithIndex.foreach { case ((label, v), i) =>
      val y = Margin / 2 + i * Cell
      val len = math.round(barW * (math.max(v, 0.0) / vmax)).toInt
      sb ++= s"""<text x="${Margin - 8}" y="${y + Cell / 2 + 4}" font-size="10" text-anchor="end">${esc(label)}</text>""" + "\n"
      sb ++= s"""<rect x="$Margin" y="${y + 8}" width="$len" height="${Cell - 16}" fill="${ramp(0.75)}"/>""" + "\n"
      sb ++= s"""<text x="${Margin + len + 6}" y="${y + Cell / 2 + 4}" font-size="10">${esc(fmt(v))}</text>""" + "\n"
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Write an SVG document to a local path (driver-side single file —
    * figures are k×k artifacts, not datasets). */
  def writeSvg(svg: String, path: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, svg.getBytes(StandardCharsets.UTF_8))
  }
}
