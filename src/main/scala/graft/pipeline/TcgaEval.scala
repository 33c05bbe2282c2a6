package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Align, LabelCodec, OmicsReader, Scalers, Splits}
import graft.ml.GaussianNB
import graft.nn.{ArchZoo, Inference, Trainer}

/** TCGA-shaped evaluation pipeline (SURVEY §3.3 — AE_results.ipynb):
  * samples-as-rows TSV views (S2) + positionally-aligned label file
  * (S3, cell 67) → fixed label codes (F3, Data_prep.py:86-89) →
  * stratified 80/20 split seed 42 (SP1, sizes 1494/372 at reference
  * scale, cell 68) → per-split min-max (A1 — the reference refits on
  * the split being transformed, cell 81) → AE training → per-subject
  * recon loss mean±std per split (cells 78-79) → GaussianNB 5-fold CV
  * on embeddings (M1, cells 121/124).
  */
object TcgaEval {

  final case class Result(reconTable: DataFrame, nbTable: DataFrame,
      trainCount: Long, testCount: Long)

  def run(spark: SparkSession, expPath: String, mirnaPath: String,
      labelsPath: String, mkArch: (Int, Int) => ArchZoo.Arch,
      epochs: Int = 3, batchSize: Int = 128, lr: Double = 1e-3,
      idCol: String = "_c0"): Result = {

    // distributed zipWithIndex (file order) — no no-partition window
    def withIdx(df: DataFrame): DataFrame =
      OmicsReader.withRowIdx(df, "sample_idx")

    val exp = withIdx(OmicsReader.readSamplesAsRows(spark, expPath, idCol).data)
    val mirna = withIdx(
      OmicsReader.readSamplesAsRows(spark, mirnaPath, idCol).data)
    val labels = OmicsReader.readLabels(spark, labelsPath)

    // positional alignment (cell 67) then keyed pairing (J1)
    val labeled = exp.join(labels, "sample_idx")
      .withColumn("label_idx",
        LabelCodec.encode(col("label"), LabelCodec.tcgaLabelMap))
    val paired = Align.pair(
        labeled.select("sample_id", "features"),
        mirna.select("sample_id", "features"))
      .join(labeled.select("sample_id", "label", "label_idx"), "sample_id")

    val split = Splits.stratifiedFlag(paired, "label", "sample_id", 0.8, 42)
    // the reference scales each split with its OWN min/max (cell 81)
    def scaleViews(df: DataFrame): DataFrame = {
      val s1 = Scalers.fitTransform(df, "x1")
      Scalers.fitTransform(s1, "x2")
    }
    val train = scaleViews(split.filter(col("is_train"))).cache()
    val test = scaleViews(split.filter(!col("is_train"))).cache()
    val (nTrain, nTest) = (train.count(), test.count())

    val d1 = train.select(size(col("x1"))).head().getInt(0)
    val d2 = train.select(size(col("x2"))).head().getInt(0)
    val arch = mkArch(d1, d2)
    val trained = Trainer.train(train, arch.model,
      Trainer.Config(lr = lr, weightDecay = 1e-6, batchSize = batchSize,
        epochs = epochs, seed = 21))

    def reconStats(df: DataFrame, splitName: String): DataFrame =
      Inference.embedAndRecon(df, arch.model, trained.params,
          trained.stats, arch.embed)
        .agg(round(avg("recon_loss"), 4).as("mean"),
          round(stddev_pop("recon_loss"), 4).as("std"))
        .select(lit(arch.name).as("model"), lit(splitName).as("split"),
          col("mean"), col("std"))

    val reconTable = reconStats(train, "train")
      .unionByName(reconStats(test, "test"))

    val testEmbedded = Inference.embedAndRecon(test, arch.model,
      trained.params, trained.stats, arch.embed)
    val nbTable = GaussianNB.crossValidate(
        testEmbedded.select(col("sample_id"), col("label_idx"),
          col("embedding").as("features")),
        k = 5, seed = 2023)
      .select(lit(arch.name).as("feature_set"), col("fold"), col("accuracy"))

    train.unpersist(); test.unpersist()
    Result(reconTable, nbTable, nTrain, nTest)
  }
}
