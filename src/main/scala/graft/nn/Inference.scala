package graft.nn

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** M14/M24/A10 — eval-mode AE inference as a distributed operator:
  * broadcast weights, per-partition breeze GEMM over row blocks, one
  * output row per input row. Embedding extraction and per-subject
  * reconstruction loss (ref: embedding_from_retrained_models.py:36-91,
  * reconloss_from_retrained_models.py:8-95).
  */
object Inference {

  private val BlockSize = 256

  /** Adds `embedding: Array[Double]` and `recon_loss: Double` columns. */
  def embedAndRecon(df: DataFrame, ae: TwoViewAe, params: Array[Double],
      stats: Array[Double], x1Col: String = "x1",
      x2Col: String = "x2"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast((params, stats))
    val i1 = df.schema.fieldIndex(x1Col)
    val i2 = df.schema.fieldIndex(x2Col)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("embedding", ArrayType(DoubleType)),
      StructField("recon_loss", DoubleType)))
    val rdd = df.rdd.mapPartitions { it =>
      val (p, s) = bc.value
      it.grouped(BlockSize).flatMap { block =>
        val x1 = DenseMatrix.tabulate(block.size,
          block.head.getSeq[Double](i1).length)((r, c) =>
          block(r).getSeq[Double](i1)(c))
        val x2 = DenseMatrix.tabulate(block.size,
          block.head.getSeq[Double](i2).length)((r, c) =>
          block(r).getSeq[Double](i2)(c))
        val (z, s1hat, s2hat) = Kernel.evalForward(ae, p, s, x1, x2)
        val (o1, _) = Kernel.rowNormalize(s1hat)
        val (t1, _) = Kernel.rowNormalize(x1)
        val (o2, _) = Kernel.rowNormalize(s2hat)
        val (t2, _) = Kernel.rowNormalize(x2)
        block.indices.map { r =>
          def dist(a: DenseMatrix[Double], b: DenseMatrix[Double]): Double = {
            var acc = 0.0; var c = 0
            while (c < a.cols) {
              val d = a(r, c) - b(r, c); acc += d * d; c += 1
            }
            math.sqrt(acc)
          }
          val emb = Array.tabulate(z.cols)(c => z(r, c))
          Row.fromSeq(block(r).toSeq ++
            Seq(emb.toSeq, dist(o1, t1) + dist(o2, t2)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
