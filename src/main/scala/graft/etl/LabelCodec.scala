package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label derivation and encoding.
  *
  * The reference derives simulation labels from the sample-id prefix
  * (`i.split('.')[0]` — Simulation_Models/CNC_AE_model_selection.py:514)
  * and encodes labels with FIXED dictionaries whose order must be
  * reproduced exactly (TCGA_Auxiliary/Data_prep.py:86-89;
  * CNC_AE_model_selection.py:468-470) — so the codec is a literal
  * chained-when expression (constant-folded by Catalyst), NOT a
  * frequency-ordered StringIndexer.
  */
object LabelCodec {

  /** `sample_id.split('.')[0]` — pandas str.split is literal, Spark's is
    * regex: the dot must be escaped. */
  def prefixLabel(sampleId: Column): Column =
    element_at(split(sampleId, "\\."), 1)

  /** TCGA fixed label codes (Data_prep.py:86-89). */
  val tcgaLabelMap: Seq[(String, Int)] = Seq(
    "Primary Tumor*breast" -> 0,
    "Primary Tumor*lung" -> 1,
    "Primary Tumor*melanoma" -> 2,
    "Primary Tumor*liver" -> 3,
    "Primary Tumor*sarcoma" -> 4,
    "Primary Tumor*kidney" -> 5)

  /** Simulation fixed label codes (CNC_AE_model_selection.py:468-470). */
  val simulationLabelMap: Seq[(String, Int)] =
    (1 to 6).map(g => s"Group$g" -> (g - 1))

  def encode(label: Column, mapping: Seq[(String, Int)]): Column =
    mapping.foldLeft(lit(null).cast("int")) { case (acc, (k, v)) =>
      when(label === k, v).otherwise(acc)
    }

  /** Strip a fixed prefix from labels for presentation
    * (`k.replace('Primary Tumor*', '')` — tsn_visulization.py:21;
    * `*` escaped because Spark regexp_replace is regex). */
  def stripPrefix(label: Column, prefix: String): Column =
    regexp_replace(label, java.util.regex.Pattern.quote(prefix), "")

  def withDerivedLabel(df: DataFrame, mapping: Seq[(String, Int)]): DataFrame =
    df.withColumn("label", prefixLabel(col("sample_id")))
      .withColumn("label_idx", encode(col("label"), mapping))
}
