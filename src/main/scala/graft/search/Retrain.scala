package graft.search

import org.apache.spark.sql.DataFrame
import graft.nn.{AeModel, ModelIO, Trainer}

/** M23 — retraining with the selected hyperparameters on the full
  * training set, then persisting the model (ref:
  * Simulation_Models/CNC_AE_retraining.py:168-258 — same loop as
  * selection but single split, best `epoch` hyper, torch.save at
  * :250-252 → ModelIO parquet here).
  */
object Retrain {

  final case class RetrainedModel(model: AeModel, params: Array[Double],
      stats: Array[Double], epochLosses: Seq[Double])

  def run(trainDf: DataFrame, mkModel: RandomSearch.Hypers => AeModel,
      best: RandomSearch.Hypers, epochScale: Double = 1.0,
      savePath: Option[String] = None): RetrainedModel = {
    val epochs = math.max(1, math.round(best.epochs * epochScale).toInt)
    val model = mkModel(best)
    val trained = Trainer.train(trainDf, model,
      Trainer.Config(lr = best.lr, weightDecay = best.l2,
        batchSize = best.batchSize, epochs = epochs, seed = 21))
    savePath.foreach { p =>
      model match {
        case graft.nn.Trainer.TwoViewModel(ae) =>
          ModelIO.save(trainDf.sparkSession, p, ae, trained.params,
            trained.stats)
        case _ => GraphModelIO.save(trainDf.sparkSession, p, model,
          trained.params, trained.stats)
      }
    }
    RetrainedModel(model, trained.params, trained.stats,
      trained.epochLosses)
  }
}

/** Persistence for arbitrary AeModels (graph or kernel) — weights
  * parquet + java-serialized model (S10). */
object GraphModelIO {
  import org.apache.spark.sql.SparkSession

  def save(spark: SparkSession, path: String, model: AeModel,
      params: Array[Double], stats: Array[Double]): Unit = {
    import spark.implicits._
    val rows =
      params.iterator.zipWithIndex.map { case (v, i) => ("param", i, v) } ++
      stats.iterator.zipWithIndex.map { case (v, i) => ("stat", i, v) }
    rows.toSeq.toDF("kind", "idx", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$path/weights")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(model); oos.close()
    Seq(bos.toByteArray).toDF("spec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/spec")
  }

  def load(spark: SparkSession, path: String)
      : (AeModel, Array[Double], Array[Double]) = {
    val specBytes = spark.read.parquet(s"$path/spec")
      .head().getAs[Array[Byte]](0)
    val model = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(specBytes))
      .readObject().asInstanceOf[AeModel]
    val w = spark.read.parquet(s"$path/weights").collect()
    val params = new Array[Double](model.paramCount)
    val stats = new Array[Double](model.statCount)
    w.foreach { r =>
      val arr = if (r.getString(0) == "param") params else stats
      arr(r.getInt(1)) = r.getDouble(2)
    }
    (model, params, stats)
  }
}
