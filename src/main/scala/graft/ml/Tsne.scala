package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector, sum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M12 — t-SNE, 2-D, PCA-initialized (ref: Evaluation_Auxiliary/
  * tsn_visulization.py:8-27 — sklearn `TSNE(n_components=2,
  * init='pca')`). Standard exact algorithm (van der Maaten & Hinton,
  * JMLR 2008): per-row perplexity calibration by binary search, early
  * exaggeration, momentum gradient descent on the student-t similarity
  * mismatch.
  *
  * Deliberately driver-local (SURVEY §2.9 M12): the reference embeds
  * ≤1866 rows; O(n²) on the driver is the right tool, and unlike
  * sklearn this version is deterministic given the seed. The distributed
  * part of the pipeline is upstream (embedding extraction); t-SNE is a
  * presentation-layer reduction.
  */
object Tsne {

  /** learningRate ≤ 0 → sklearn 'auto': max(n / earlyExag / 4, 50). */
  final case class Config(perplexity: Double = 30.0, iters: Int = 1000,
      learningRate: Double = -1.0, earlyExagIters: Int = 250,
      earlyExag: Double = 12.0, seed: Long = 42)

  /** (sample_id, y1, y2) for the array `featuresCol`. Collects to the
    * driver (n is presentation-scale by contract). */
  def embed2d(df: DataFrame, featuresCol: String = "features",
      idCol: String = "sample_id", cfg: Config = Config()): DataFrame = {
    val rows = df.select(col(idCol), col(featuresCol)).collect()
    val ids = rows.map(_.get(0))
    val x = DenseMatrix.tabulate(rows.length,
      rows.head.getSeq[Double](1).length)((r, c) => rows(r).getSeq[Double](1)(c))
    val y = run(x, cfg)
    val spark = df.sparkSession
    import spark.implicits._
    ids.indices.map(i => (ids(i).toString, y(i, 0), y(i, 1)))
      .toDF(idCol, "tsne_1", "tsne_2")
  }

  def run(x: DenseMatrix[Double], cfg: Config): DenseMatrix[Double] = {
    val n = x.rows
    val lr = if (cfg.learningRate > 0) cfg.learningRate
      else math.max(n / cfg.earlyExag / 4.0, 50.0)
    val p = jointProbabilities(squaredDistances(x), cfg.perplexity)

    // PCA init (top-2 components, deterministic sign), scaled 1e-4 as in
    // the standard implementation
    var y = pcaInit(x) * 1e-4
    val dy = DenseMatrix.zeros[Double](n, 2)
    val gains = DenseMatrix.fill(n, 2)(1.0)

    for (iter <- 0 until cfg.iters) {
      val exag = if (iter < cfg.earlyExagIters) cfg.earlyExag else 1.0
      val grad = gradient(p, y, exag)
      val momentum = if (iter < cfg.earlyExagIters) 0.5 else 0.8
      var i = 0
      while (i < n) {
        var d = 0
        while (d < 2) {
          gains(i, d) = math.max(0.01,
            if ((grad(i, d) > 0) != (dy(i, d) > 0)) gains(i, d) + 0.2
            else gains(i, d) * 0.8)
          dy(i, d) = momentum * dy(i, d) - lr * gains(i, d) * grad(i, d)
          d += 1
        }
        i += 1
      }
      y += dy
      // re-center
      val mean0 = sum(y(::, 0)) / n
      val mean1 = sum(y(::, 1)) / n
      i = 0
      while (i < n) { y(i, 0) -= mean0; y(i, 1) -= mean1; i += 1 }
    }
    y
  }

  private def squaredDistances(x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = x.rows
    val sq = DenseVector.tabulate(n) { i =>
      var acc = 0.0; var c = 0
      while (c < x.cols) { acc += x(i, c) * x(i, c); c += 1 }
      acc
    }
    val g = x * x.t
    DenseMatrix.tabulate(n, n)((i, j) =>
      math.max(0.0, sq(i) + sq(j) - 2 * g(i, j)))
  }

  /** Symmetrized conditional probabilities at the target perplexity
    * (binary search on precision beta per row). */
  def jointProbabilities(d2: DenseMatrix[Double],
      perplexity: Double): DenseMatrix[Double] = {
    val n = d2.rows
    val logU = math.log(perplexity)
    val p = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var beta = 1.0
      var tries = 0
      var done = false
      while (!done && tries < 50) {
        var sumP = 0.0
        var j = 0
        while (j < n) {
          if (j != i) { p(i, j) = math.exp(-d2(i, j) * beta); sumP += p(i, j) }
          else p(i, j) = 0.0
          j += 1
        }
        if (sumP < 1e-300) sumP = 1e-300
        var entropy = 0.0
        j = 0
        while (j < n) {
          if (j != i && p(i, j) > 0) {
            val pj = p(i, j) / sumP
            entropy -= pj * math.log(pj)
          }
          j += 1
        }
        j = 0
        while (j < n) { p(i, j) /= sumP; j += 1 }
        val diff = entropy - logU
        if (math.abs(diff) < 1e-5) done = true
        else if (diff > 0) { // entropy too high → increase beta
          betaMin = beta
          beta = if (betaMax.isPosInfinity) beta * 2 else (beta + betaMax) / 2
        } else {
          betaMax = beta
          beta = if (betaMin.isNegInfinity) beta / 2 else (beta + betaMin) / 2
        }
        tries += 1
      }
    }
    // symmetrize and normalize
    val out = DenseMatrix.tabulate(n, n)((i, j) =>
      (p(i, j) + p(j, i)) / (2.0 * n))
    out.map(v => math.max(v, 1e-12))
  }

  private def gradient(p: DenseMatrix[Double], y: DenseMatrix[Double],
      exag: Double): DenseMatrix[Double] = {
    val n = y.rows
    val num = DenseMatrix.zeros[Double](n, n) // 1/(1+||yi-yj||²)
    var qSum = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (i != j) {
          val d0 = y(i, 0) - y(j, 0); val d1 = y(i, 1) - y(j, 1)
          val v = 1.0 / (1.0 + d0 * d0 + d1 * d1)
          num(i, j) = v; qSum += v
        }
        j += 1
      }
      i += 1
    }
    val grad = DenseMatrix.zeros[Double](n, 2)
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (i != j) {
          val q = math.max(num(i, j) / qSum, 1e-12)
          val mult = (exag * p(i, j) - q) * num(i, j) * 4.0
          grad(i, 0) += mult * (y(i, 0) - y(j, 0))
          grad(i, 1) += mult * (y(i, 1) - y(j, 1))
        }
        j += 1
      }
      i += 1
    }
    grad
  }

  private def pcaInit(x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = x.rows
    val mean = DenseVector.tabulate(x.cols)(c => sum(x(::, c)) / n)
    val centered = DenseMatrix.tabulate(n, x.cols)((r, c) => x(r, c) - mean(c))
    val cov = (centered.t * centered) / (n - 1).toDouble
    val es = breeze.linalg.eigSym(cov)
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).map(_._2)
    val pcs = DenseMatrix.tabulate(x.cols, 2)((r, c) =>
      es.eigenvectors(r, order(c)))
    // deterministic sign: largest-|loading| component positive
    for (c <- 0 until 2) {
      val colV = pcs(::, c)
      val m = (0 until x.cols).maxBy(r => math.abs(colV(r)))
      if (colV(m) < 0) pcs(::, c) := pcs(::, c) * -1.0
    }
    centered * pcs
  }
}
