package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** External clustering-agreement metrics, computed from ONE distributed
  * pass: a single groupBy((label, pred)) count — map-side combinable,
  * k² result rows — collected to the driver, where all metrics are pure
  * arithmetic over those ≤k² cells (the SURVEY §4.3-sanctioned k×k
  * driver finish). Asking for NMI+ARI+FM+v-measure together costs one
  * scan of the data, not one per metric.
  *
  * Reference semantics (Simulation_Auxiliary/evaluation.py:6-9):
  * sklearn `normalized_mutual_info_score` (arithmetic mean normalization,
  * the sklearn default), `adjusted_rand_score`, `fowlkes_mallows_score`,
  * `accuracy_score`, `metrics.confusion_matrix` (evaluation.py:44), and
  * `v_measure_score` (imported at CNC_AE_model_selection.py:20 — M8).
  */
object ClusteringMetrics {

  /** All agreement metrics derived from one contingency collect. */
  final case class Agreement(
      nmi: Double, ari: Double, fowlkesMallows: Double,
      homogeneity: Double, completeness: Double, vMeasure: Double)

  /** A6 — contingency table (cnt per (label, pred) pair). */
  def contingency(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): DataFrame =
    df.groupBy(labelCol, predCol).agg(count(lit(1)).as("cnt"))

  /** A8 — plain accuracy. */
  def accuracy(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double =
    df.agg(avg(when(col(labelCol) === col(predCol), 1.0).otherwise(0.0)))
      .head().getDouble(0)

  /** One scan: collect the ≤k² contingency cells (sorted for a
    * deterministic summation order), then finish on the driver. */
  def agreement(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Agreement = {
    // null labels/preds map to a sentinel (sklearn's encoder treats None
    // as its own class; a raw null would NPE in Ordering[String])
    val cells = contingency(df, labelCol, predCol)
      .select(coalesce(col(labelCol).cast("string"), lit("\u0000null"))
          .as("l"),
        coalesce(col(predCol).cast("string"), lit("\u0000null")).as("p"),
        col("cnt").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    agreementFromCells(cells.toIndexedSeq)
  }

  /** Pure-arithmetic finish over contingency cells (label, pred, cnt). */
  def agreementFromCells(cells: Seq[(String, String, Long)]): Agreement = {
    val n = cells.map(_._3).sum.toDouble
    require(n > 0, "agreement over an empty contingency")
    // marginals in sorted-key order (deterministic FP summation)
    val ai = cells.groupBy(_._1).view
      .mapValues(_.map(_._3).sum.toDouble).toMap
    val bj = cells.groupBy(_._2).view
      .mapValues(_.map(_._3).sum.toDouble).toMap
    def entropy(marg: Map[String, Double]): Double =
      -marg.toSeq.sortBy(_._1).map { case (_, m) => m / n * math.log(m / n) }.sum

    // MI + NMI (arithmetic-mean normalization, sklearn default)
    val mi = cells.map { case (l, p, c) =>
      c / n * math.log(n * c / (ai(l) * bj(p)))
    }.sum
    val hu = entropy(ai)
    val hv = entropy(bj)
    val nmi = if (hu == 0.0 && hv == 0.0) 1.0 else mi / ((hu + hv) / 2.0)

    // pair-counting sums → ARI (Hubert & Arabie 1985) + Fowlkes-Mallows
    def comb2(x: Double): Double = x * (x - 1) / 2
    val sij = cells.map(c => comb2(c._3.toDouble)).sum
    val sa = ai.toSeq.sortBy(_._1).map(m => comb2(m._2)).sum
    val sb = bj.toSeq.sortBy(_._1).map(m => comb2(m._2)).sum
    val expected = sa * sb / comb2(n)
    val maxIdx = (sa + sb) / 2
    val ari =
      if (maxIdx == expected) 1.0 else (sij - expected) / (maxIdx - expected)
    val fm = if (sa == 0.0 || sb == 0.0) 0.0 else sij / math.sqrt(sa * sb)

    // M8 — v-measure (Rosenberg & Hirschberg 2007, sklearn beta=1):
    // homogeneity = 1 − H(C|K)/H(C), completeness = 1 − H(K|C)/H(K).
    val hck = -cells.map { case (_, p, c) => c / n * math.log(c / bj(p)) }.sum
    val hkc = -cells.map { case (l, _, c) => c / n * math.log(c / ai(l)) }.sum
    val homogeneity = if (hu == 0.0) 1.0 else 1.0 - hck / hu
    val completeness = if (hv == 0.0) 1.0 else 1.0 - hkc / hv
    val vMeasure =
      if (homogeneity + completeness == 0.0) 0.0
      else 2 * homogeneity * completeness / (homogeneity + completeness)

    Agreement(nmi, ari, fm, homogeneity, completeness, vMeasure)
  }

  /** M4 — NMI with arithmetic mean normalization (sklearn default). */
  def nmi(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double = agreement(df, labelCol, predCol).nmi

  /** M5 — Adjusted Rand Index. */
  def ari(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double = agreement(df, labelCol, predCol).ari

  /** M6 — Fowlkes-Mallows: TP / sqrt((TP+FP)(TP+FN)). */
  def fowlkesMallows(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double =
    agreement(df, labelCol, predCol).fowlkesMallows

  /** M8 — v-measure (harmonic mean of homogeneity and completeness). */
  def vMeasure(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double =
    agreement(df, labelCol, predCol).vMeasure
}
