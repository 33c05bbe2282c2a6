package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Deterministic, scalable replacements for the reference's sampling
  * operators (SURVEY §2.4):
  *
  *  - SP1 stratified 80/20 split with EXACT per-class counts, seeded
  *    (ref: TCGA_Auxiliary/Data_prep.py:16-58, seed 42). NumPy bit-parity
  *    is a declared non-goal (SURVEY §5.2.5); the contract kept is: exact
  *    `round(n_class * prop)` counts, disjoint partition, seed-determinism.
  *  - SP2 k-fold assignment, seeded shuffle
  *    (ref: Simulation_Models/CNC_AE_model_selection.py:346-358, seed 21).
  *  - SP3 stratified k-fold (ref: Evaluation_Auxiliary/nb_classification.py:20).
  *
  * Implementation is pure window functions over a seeded hash order — no
  * RNG state, no driver collection, reproducible on any cluster layout.
  */
object Splits {

  private def seededOrder(keyCol: String, seed: Long) =
    Seq(xxhash64(col(keyCol), lit(seed)), col(keyCol))

  /** Adds boolean `is_train`: exactly `round(n_class * prop)` rows per
    * label value are train. */
  def stratifiedFlag(df: DataFrame, labelCol: String, keyCol: String,
      prop: Double, seed: Long): DataFrame = {
    val w = Window.partitionBy(labelCol).orderBy(seededOrder(keyCol, seed): _*)
    val wc = Window.partitionBy(labelCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .withColumn("is_train", col("__rn") <= round(col("__cnt") * prop))
      .drop("__rn", "__cnt")
  }

  /** Adds `fold` ∈ [0, k): global seeded shuffle, round-robin assignment
    * (fold sizes differ by ≤ 1, matching sklearn KFold(shuffle=True)).
    *
    * Scale shape: a distributed range-partitioned sort on the seeded
    * hash followed by RDD `zipWithIndex` (per-partition counts + offset,
    * one extra tiny job) — NOT a no-partition window, which would funnel
    * every row through a single task. Output values are identical to the
    * windowed formulation (same total order, same round-robin deal).
    * The contract query SP2 instead uses the pure hash-fold expression
    * (`fold = hash(key) % k`, zero shuffle, binomial fold sizes); this
    * library path keeps sklearn's exact ≤1-size-difference guarantee for
    * the CV pipelines. */
  def kFoldColumn(df: DataFrame, keyCol: String, k: Int, seed: Long): DataFrame = {
    val sorted = df.orderBy(seededOrder(keyCol, seed): _*)
    val schema = sorted.schema.add("fold", IntegerType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i % k).toInt)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Adds `fold` ∈ [0, k) stratified by label: within each class the
    * seeded order is dealt round-robin, so each fold holds ~1/k of every
    * class (sklearn StratifiedKFold semantics). */
  def stratifiedKFold(df: DataFrame, labelCol: String, keyCol: String,
      k: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy(labelCol).orderBy(seededOrder(keyCol, seed): _*)
    df.withColumn("fold", pmod(row_number().over(w) - 1, lit(k)).cast("int"))
  }
}
