package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{LabelCodec, OmicsReader, Scalers, Splits}
import graft.ml.GaussianNB

/** SURVEY §7.3 minimum end-to-end slice: "NB accuracy of the raw miRNA
  * view on a simulation dataset".
  *
  * ingest (S1 transpose) → labels from id prefix (F2/F3) → stratified
  * 80/20 (SP1, seed 42) → per-split MinMax (A1) → stratified 5-fold
  * (SP3) → GaussianNB per fold (M1) → (fold, accuracy).
  *
  * Mirrors the reference composition:
  * Simulation_Models/CNC_AE_model_selection.py:507-518 (load/align/label),
  * TCGA_Auxiliary/Data_prep.py:16-76 (split/scale),
  * Evaluation_Auxiliary/nb_classification.py:1-38 (NB 5-fold CV).
  */
object SimulationNb {

  def run(spark: SparkSession, path: String,
      splitSeed: Long = 42, cvSeed: Long = 2023): DataFrame = {
    val m = OmicsReader.readTransposed(spark, path)
    val labeled = LabelCodec.withDerivedLabel(
      m.data, LabelCodec.simulationLabelMap)
    val train = Splits
      .stratifiedFlag(labeled, "label", "sample_id", 0.8, splitSeed)
      .filter(col("is_train"))
    val scaled = Scalers.fitTransform(train)
    GaussianNB.crossValidate(scaled, k = 5, seed = cvSeed)
  }
}
