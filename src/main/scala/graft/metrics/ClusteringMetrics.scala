package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** External clustering-agreement metrics, computed as distributed
  * DataFrame aggregations over the (label, pred) contingency table —
  * never materializing more than the k×k table.
  *
  * Reference semantics (Simulation_Auxiliary/evaluation.py:6-9):
  * sklearn `normalized_mutual_info_score` (arithmetic mean normalization,
  * the sklearn default), `adjusted_rand_score`, `fowlkes_mallows_score`,
  * `accuracy_score`, and `metrics.confusion_matrix` (evaluation.py:44).
  *
  * Scale: the only data-sized operation is one groupBy((label, pred))
  * count — map-side combinable, k² result rows. Everything downstream is
  * arithmetic over k² rows.
  */
object ClusteringMetrics {

  /** A6 — contingency table (cnt per (label, pred) pair). */
  def contingency(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): DataFrame =
    df.groupBy(labelCol, predCol).agg(count(lit(1)).as("cnt"))

  /** A8 — plain accuracy. */
  def accuracy(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double =
    df.agg(avg(when(col(labelCol) === col(predCol), 1.0).otherwise(0.0)))
      .head().getDouble(0)

  /** M4 — NMI with arithmetic mean normalization (sklearn default:
    * MI / ((H(U)+H(V))/2)). Natural log, like sklearn. */
  def nmi(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double = {
    val c = contingency(df, labelCol, predCol)
    val wA = Window.partitionBy(labelCol)
    val wB = Window.partitionBy(predCol)
    val n = sum("cnt").over(Window.partitionBy())
    val terms = c
      .withColumn("ai", sum("cnt").over(wA))
      .withColumn("bj", sum("cnt").over(wB))
      .withColumn("n", n)
    val row = terms.agg(
      sum((col("cnt") / col("n")) *
        log(col("n") * col("cnt") / (col("ai") * col("bj")))).as("mi"))
      .head()
    val mi = row.getDouble(0)
    def entropyOf(mCol: String): Double = {
      val marg = df.groupBy(mCol).agg(count(lit(1)).as("m"))
      marg.withColumn("n", sum("m").over(Window.partitionBy()))
        .agg(sum((col("m") / col("n")) * log(col("m") / col("n"))))
        .head().getDouble(0) * -1.0
    }
    val (hu, hv) = (entropyOf(labelCol), entropyOf(predCol))
    if (hu == 0.0 && hv == 0.0) 1.0 else mi / ((hu + hv) / 2.0)
  }

  private def comb2(c: Column): Column = c * (c - 1) / 2

  /** Pair-counting sums (Σ C(nij,2), Σ C(ai,2), Σ C(bj,2), n). */
  private def pairSums(df: DataFrame, labelCol: String, predCol: String)
      : (Double, Double, Double, Double) = {
    val c = contingency(df, labelCol, predCol)
    val sij = c.agg(sum(comb2(col("cnt")))).head().getDouble(0)
    def margSum(mCol: String): Double =
      df.groupBy(mCol).agg(count(lit(1)).as("m"))
        .agg(sum(comb2(col("m")))).head().getDouble(0)
    val n = df.count().toDouble
    (sij, margSum(labelCol), margSum(predCol), n)
  }

  /** M5 — Adjusted Rand Index (Hubert & Arabie 1985). */
  def ari(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double = {
    val (sij, sa, sb, n) = pairSums(df, labelCol, predCol)
    val expected = sa * sb / (n * (n - 1) / 2)
    val maxIdx = (sa + sb) / 2
    if (maxIdx == expected) 1.0 else (sij - expected) / (maxIdx - expected)
  }

  /** M6 — Fowlkes-Mallows: TP / sqrt((TP+FP)(TP+FN)). */
  def fowlkesMallows(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): Double = {
    val (sij, sa, sb, _) = pairSums(df, labelCol, predCol)
    if (sa == 0.0 || sb == 0.0) 0.0 else sij / math.sqrt(sa * sb)
  }
}
