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

  /** M10 — Calinski-Harabasz: (BG/(k−1)) / (WG/(n−k)). */
  def calinskiHarabasz(df: DataFrame, featuresCol: String = "features",
      predCol: String = "pred"): Double = {
    val n = df.count().toDouble
    val cells = centroidCells(df, featuresCol, predCol).cache()
    val k = cells.select(predCol).distinct().count().toDouble
    // global mean per dim (weighted by cluster sizes)
    val bg = cells
      .withColumn("gmean",
        sum(col("c") * col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("dim")) /
        sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("dim")))
      .agg(sum(col("n") * pow(col("c") - col("gmean"), 2)))
      .head().getDouble(0)
    // WG = Σ_rows ‖x − c_cluster‖² via long-form join on (pred, dim)
    val wg = df
      .select(col(predCol), posexplode(col(featuresCol)).as(Seq("dim", "v")))
      .join(cells.select(predCol, "dim", "c"), Seq(predCol, "dim"))
      .agg(sum(pow(col("v") - col("c"), 2))).head().getDouble(0)
    cells.unpersist()
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
