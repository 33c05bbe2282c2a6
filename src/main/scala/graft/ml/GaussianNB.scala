package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Gaussian Naive Bayes with sklearn semantics
  * (ref: Evaluation_Auxiliary/nb_classification.py:1-38 uses
  * `sklearn.naive_bayes.GaussianNB`).
  *
  * sklearn parity points implemented exactly:
  *  - per-(class, feature) mean and POPULATION variance;
  *  - variance smoothing: var += var_smoothing * max(var over all
  *    features of the pooled data) with var_smoothing = 1e-9;
  *  - priors from class frequencies;
  *  - argmax over Σ log N(x|θ) + log prior, ties → first class in
  *    sorted order.
  *
  * Scale: fit is one long-form (class, dim) aggregation — map-side
  * combined, k×w result. Predict broadcasts the k×w stats and scores
  * each partition locally (the MLlib pattern) — no shuffle, no
  * per-row joins against k×w cells.
  */
object GaussianNB {

  final case class Model(
      classes: Array[Long],
      priors: Array[Double],        // log priors, per class
      means: Array[Array[Double]],  // [class][dim]
      vars: Array[Array[Double]])   // smoothed, [class][dim]

  def fit(df: DataFrame, featuresCol: String = "features",
      labelCol: String = "label_idx", varSmoothing: Double = 1e-9): Model = {
    val cells = df
      .select(col(labelCol).cast("long").as("cls"),
        posexplode(col(featuresCol)).as(Seq("dim", "v")))
      .groupBy("cls", "dim")
      .agg(avg("v").as("m"), var_pop("v").as("s2"), count(lit(1)).as("n"))
      .collect()
    // sklearn: smoothing epsilon = var_smoothing * max variance of the
    // POOLED data (all classes together)
    val pooledMaxVar = df
      .select(posexplode(col(featuresCol)).as(Seq("dim", "v")))
      .groupBy("dim").agg(var_pop("v").as("s2"))
      .agg(max("s2")).head().getDouble(0)
    val epsilon = varSmoothing * pooledMaxVar

    val classes = cells.map(_.getLong(0)).distinct.sorted
    val cIdx = classes.zipWithIndex.toMap
    val w = cells.map(_.getInt(1)).max + 1
    val means = Array.ofDim[Double](classes.length, w)
    val vars = Array.ofDim[Double](classes.length, w)
    val counts = new Array[Double](classes.length)
    cells.foreach { r =>
      val c = cIdx(r.getLong(0)); val dim = r.getInt(1)
      means(c)(dim) = r.getDouble(2)
      vars(c)(dim) = r.getDouble(3) + epsilon
      counts(c) = r.getLong(4).toDouble
    }
    val n = counts.sum
    Model(classes, counts.map(c => math.log(c / n)), means, vars)
  }

  /** Adds `pred` (the argmax class) to df. Stats are broadcast; scoring
    * is per-partition local arithmetic. */
  def predict(df: DataFrame, model: Model,
      featuresCol: String = "features"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val outSchema = StructType(df.schema.fields :+ StructField("pred", LongType))
    val fIdx = df.schema.fieldIndex(featuresCol)
    val rdd = df.rdd.mapPartitions { it =>
      val m = bc.value
      val k = m.classes.length
      it.map { row =>
        val x = row.getSeq[Double](fIdx)
        var best = 0; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var s = m.priors(c)
          var j = 0
          while (j < x.length) {
            val d = x(j) - m.means(c)(j)
            s += -0.5 * (math.log(2 * math.Pi * m.vars(c)(j)) +
              d * d / m.vars(c)(j))
            j += 1
          }
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        Row.fromSeq(row.toSeq :+ m.classes(best))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** M1+SP3 — stratified k-fold CV accuracy: returns (fold, accuracy)
    * rows, one per fold (nb_classification.py:20 —
    * cross_validate(GaussianNB(), cv=5) over stratified folds). */
  def crossValidate(df: DataFrame, k: Int = 5, seed: Long = 2023,
      featuresCol: String = "features", labelCol: String = "label_idx",
      keyCol: String = "sample_id"): DataFrame = {
    import graft.etl.Splits
    val folded = Splits.stratifiedKFold(df, labelCol, keyCol, k, seed)
      .select(keyCol, labelCol, featuresCol, "fold")
      .cache()
    folded.count()
    val accs = (0 until k).flatMap { i =>
      val train = folded.filter(col("fold") =!= i)
      val test = folded.filter(col("fold") === i)
      if (test.isEmpty) None // tiny strata can leave trailing folds empty
      else {
        val model = fit(train, featuresCol, labelCol)
        val scored = predict(test, model, featuresCol)
        val acc = scored
          .agg(avg(when(col("pred") === col(labelCol).cast("long"), 1.0)
            .otherwise(0.0)))
          .head().getDouble(0)
        Some((i, acc))
      }
    }
    folded.unpersist()
    val spark = df.sparkSession
    spark.createDataFrame(accs).toDF("fold", "accuracy")
  }
}
