package graft.metrics

import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Internal clustering-quality metrics over (features: Array[Double],
  * pred) — ref: Simulation_Auxiliary/test_metrics.py:15-17 (sklearn
  * silhouette(cosine), calinski_harabasz_score, davies_bouldin_score).
  *
  * Scale: CH and DBI reduce through long-form (cluster, dim) partial
  * aggregations — one map-side-combined shuffle of k×w cells; only k
  * centroids (k×w doubles) ever reach the driver. Silhouette delegates
  * to Spark ML's squared-euclidean-trick implementation (O(n), not the
  * O(n²) textbook form).
  */
object ClusterQuality {

  /** Per-cluster centroids in long form: (pred, dim, c, n). */
  private def centroidCells(df: DataFrame, featuresCol: String,
      predCol: String): DataFrame =
    df.select(col(predCol), posexplode(col(featuresCol)).as(Seq("dim", "v")))
      .groupBy(predCol, "dim")
      .agg(avg("v").as("c"), count(lit(1)).as("n"))

  /** M10 — Calinski-Harabasz: (BG/(k−1)) / (WG/(n−k)).
    *
    * Single pass: ONE explode+groupBy shuffle reduces the table to k×w
    * sufficient-statistic cells (Σv, Σv², count); BG and WG are then
    * pure arithmetic on those cells, finished on the driver (k×w
    * doubles — the algorithm's own state, like m4/m11). The previous
    * two-pass form re-exploded the whole table a second time to join
    * centroids back for WG; WG = Σ(Σv² − (Σv)²/n) needs no second
    * pass. Cells are sorted before summing for deterministic FP. */
  def calinskiHarabasz(df: DataFrame, featuresCol: String = "features",
      predCol: String = "pred"): Double = {
    val cells = df
      .select(col(predCol).cast("string").as("p"),
        posexplode(col(featuresCol)).as(Seq("dim", "v")))
      .groupBy("p", "dim")
      .agg(sum("v").as("s1"), sum(col("v") * col("v")).as("s2"),
        count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
      .sortBy(c => (c._1, c._2))
    val n = cells.filter(_._2 == 0).map(_._5).sum.toDouble
    val k = cells.map(_._1).distinct.length.toDouble
    val perDim = cells.groupBy(_._2).view.mapValues { cs =>
      cs.map(_._3).sum / cs.map(_._5).sum // gmean of this dim
    }.toMap
    val bg = cells.map { case (_, dim, s1, _, cnt) =>
      val c = s1 / cnt
      cnt * (c - perDim(dim)) * (c - perDim(dim))
    }.sum
    val wg = cells.map { case (_, _, s1, s2, cnt) => s2 - s1 * s1 / cnt }.sum
    (bg / (k - 1)) / (wg / (n - k))
  }

  /** M11 — Davies-Bouldin: mean over clusters of max_{j≠i}
    * (s_i+s_j)/d(c_i,c_j), s = mean euclidean distance to centroid.
    * Pairwise finish on the driver (k small). */
  def daviesBouldin(df: DataFrame, featuresCol: String = "features",
      predCol: String = "pred"): Double = {
    // cents feeds two consumers (the per-row distance join and the
    // final collect) — cache the k-row frame so the long-form centroid
    // aggregation runs once, not twice
    val cents = centroidCells(df, featuresCol, predCol)
      .groupBy(predCol)
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        s => s.getField("c")).as("centroid"))
      .cache()
    val s = df
      .join(cents, predCol)
      .select(col(predCol),
        ReconLoss.rowDist(col(featuresCol), col("centroid")).as("d"))
      .groupBy(predCol).agg(avg("d").as("s"))
      .join(cents, predCol)
      .collect()
      .map(r => (r.getDouble(1), r.getSeq[Double](2).toArray))
    cents.unpersist()
    val kk = s.length
    val ratios = for (i <- 0 until kk) yield {
      (for (j <- 0 until kk if j != i) yield {
        val dij = math.sqrt(
          s(i)._2.zip(s(j)._2).map { case (a, b) => (a - b) * (a - b) }.sum)
        (s(i)._1 + s(j)._1) / dij
      }).max
    }
    ratios.sum / kk
  }

  /** M9 — silhouette; sklearn call uses metric='cosine'
    * (test_metrics.py:15). Spark ML ClusteringEvaluator supports both
    * squaredEuclidean and cosine. */
  def silhouette(df: DataFrame, featuresCol: String = "features",
      predCol: String = "pred",
      distance: String = "cosine"): Double = {
    val prepared = df.select(
      array_to_vector(col(featuresCol)).as("__feat"),
      col(predCol).cast("double").as("__pred"))
    new ClusteringEvaluator()
      .setFeaturesCol("__feat")
      .setPredictionCol("__pred")
      .setMetricName("silhouette")
      .setDistanceMeasure(distance)
      .evaluate(prepared)
  }
}
