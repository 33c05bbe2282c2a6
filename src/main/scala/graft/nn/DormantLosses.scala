package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector, diag, eigSym, sum, trace}

/** Dormant reference loss kernels, ported for inventory completeness
  * (SURVEY §2 marks both as imported-but-never-invoked by any AE
  * pipeline; they are provided as forward computations so a user
  * enabling them gets the reference's values — M17, M19/A14/A15).
  */
object DormantLosses {

  /** M17/A14 — ClusterLoss (Simulation_Auxiliary/contrastive_loss.py:
    * 70-116): entropy of the two views' cluster-usage distributions
    * (log k + Σ p log p each) plus cluster-level NT-Xent over the
    * TRANSPOSED assignment matrices (cosine similarity between the 2k
    * cluster columns, positives at ±k, CE sum / 2k).
    */
  /** A14 kernel in isolation: negative entropy of a view's cluster-usage
    * distribution, log k + Σ p log p with p = column-mass / total-mass
    * (contrastive_loss.py:79-84). Public so the oracle-checked
    * `a14_usage_entropy` query surface can be spec-pinned to the exact
    * kernel the dormant loss runs (`DormantLossesSpec`).
    *
    * Zero-mass columns: p=0 gives 0·log 0 = NaN, EXACTLY like the
    * reference's `(p_i * torch.log(p_i)).sum()` — torch NaNs there too,
    * so this is reference semantics, not a defect. The a14 query
    * surface aggregates only labels that OCCUR in a view (a groupBy has
    * no zero rows), so query ↔ kernel equivalence holds on inputs where
    * every label occurs in every view (true of the embeddings fixture;
    * spec-pinned both ways in DormantLossesSpec). */
  def negEntropy(c: DenseMatrix[Double]): Double = {
    val p = DenseVector.tabulate(c.cols)(j => sum(c(::, j)))
    val ps = p / sum(p)
    math.log(c.cols) + sum(ps.map(v => v * math.log(v)))
  }

  def clusterLoss(cI: DenseMatrix[Double], cJ: DenseMatrix[Double],
      temperature: Double): Double = {
    val k = cI.cols
    val neLoss = negEntropy(cI) + negEntropy(cJ)

    // 2k rows, each a cluster column (torch CosineSimilarity eps 1e-8)
    val c = DenseMatrix.vertcat(cI.t, cJ.t)
    val n2 = 2 * k
    val norms = DenseVector.tabulate(n2) { i =>
      math.max(math.sqrt(sum(c(i, ::).t.map(v => v * v))), 1e-8)
    }
    val sim = DenseMatrix.tabulate(n2, n2) { (i, j) =>
      var dot = 0.0
      var t = 0
      while (t < c.cols) { dot += c(i, t) * c(j, t); t += 1 }
      dot / (norms(i) * norms(j)) / temperature
    }
    var loss = 0.0
    for (i <- 0 until n2) {
      val p = if (i < k) i + k else i - k
      val logits = sim(i, p) +: (0 until n2).collect {
        case j if j != i && j != p => sim(i, j)
      }
      val mx = logits.max
      loss += -(logits.head - mx) +
        math.log(logits.map(l => math.exp(l - mx)).sum)
    }
    loss / n2 + neLoss
  }

  /** M19/A15 — deep-CCA loss (Simulation_Auxiliary/objectives.py:4-90,
    * Andrew et al. ICML 2013): −(sum of canonical correlations), with
    * the reference's regularization (r=1e-4), eigSym root-inverses, and
    * the top-k / all-singular-values variants. Inputs are
    * (samples × features) as the callers pass them (the reference
    * transposes internally).
    */
  def ccaLoss(h1: DenseMatrix[Double], h2: DenseMatrix[Double],
      outdim: Int, useAllSingularValues: Boolean): Double = {
    val (r1, eps) = (1e-4, 1e-12)
    val m = h1.rows.toDouble
    def center(h: DenseMatrix[Double]): DenseMatrix[Double] = {
      // features as rows (reference orientation)
      val ht = h.t
      val means = DenseVector.tabulate(ht.rows)(r => sum(ht(r, ::).t) / m)
      DenseMatrix.tabulate(ht.rows, ht.cols)((r, c) => ht(r, c) - means(r))
    }
    val h1b = center(h1)
    val h2b = center(h2)
    val o = h1b.rows
    val s12 = (h1b * h2b.t) / (m - 1)
    val s11 = (h1b * h1b.t) / (m - 1) + DenseMatrix.eye[Double](o) * r1
    val s22 = (h2b * h2b.t) / (m - 1) + DenseMatrix.eye[Double](o) * r1

    def rootInv(s: DenseMatrix[Double]): DenseMatrix[Double] = {
      val es = eigSym(s)
      val keep = es.eigenvalues.toArray.zipWithIndex.filter(_._1 > eps)
      val d = DenseVector(keep.map(p => math.pow(p._1, -0.5)))
      val v = DenseMatrix.tabulate(s.rows, keep.length)((r, c) =>
        es.eigenvectors(r, keep(c)._2))
      v * diag(d) * v.t
    }
    val tval = rootInv(s11) * s12 * rootInv(s22)
    val tt = tval.t * tval
    if (useAllSingularValues) {
      val ev = eigSym(tt).eigenvalues
      -sum(ev.map(v => math.sqrt(math.max(v, 0.0))))
    } else {
      val reg = tt + DenseMatrix.eye[Double](tt.rows) * r1
      val ev = eigSym(reg).eigenvalues.toArray.map(math.max(_, eps))
      -ev.sorted.takeRight(outdim).map(math.sqrt).sum
    }
  }

  /** A15 distributed path: the covariance blocks above computed via a
    * single treeAggregate of per-row outer-product contributions —
    * provided for the 100 TB note; the dormant loss itself is
    * batch-local in the reference. */
  def distributedGram(rows: org.apache.spark.rdd.RDD[Array[Double]],
      width: Int): DenseMatrix[Double] = {
    val flat = rows.treeAggregate(new Array[Double](width * width))(
      (acc, x) => {
        var i = 0
        while (i < width) {
          var j = 0
          while (j < width) { acc(i * width + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        acc
      },
      (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    DenseMatrix.tabulate(width, width)((i, j) => flat(i * width + j))
  }
}
