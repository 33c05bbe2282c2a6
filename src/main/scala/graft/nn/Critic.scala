package graft.nn

import breeze.linalg.DenseMatrix

/** M18 — LinearCritic (Simulation_Auxiliary/critic.py:5-24, dormant in
  * the reference: constructed but never trained against). Produces the
  * contrastive raw-score matrix over two batch views:
  *
  *   raw = [ sim12  sim11 ]   (2d × 2d), diagonals of sim11/sim22
  *         [ sim22  sim12ᵀ]    masked to −∞, targets = 0..2d−1
  *
  * where simXY(i,j) = cos(zX_i, zY_j) / temperature. Row i's target
  * column lands on cos(z1_i, z2_i) — the paired-view positive. Batch-
  * local math (d ≤ batch size), same placement as the other nn kernels;
  * the distributed analog of the pairwise-cosine block is the bucketed
  * SimilarityOps path.
  */
object Critic {

  /** Pairwise cosine matrix between the rows of `a` (d×m) and `b` (d×m),
    * same sequential accumulation as functions.CosineSimilarity. */
  private[nn] def cosineBlock(a: DenseMatrix[Double],
      b: DenseMatrix[Double]): DenseMatrix[Double] = {
    DenseMatrix.tabulate(a.rows, b.rows) { (i, j) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var c = 0
      while (c < a.cols) {
        val x = a(i, c); val y = b(j, c)
        dot += x * y; na += x * x; nb += y * y
        c += 1
      }
      // eps guard matches torch nn.CosineSimilarity(eps=1e-8): a
      // zero-norm row yields ~0, never NaN
      dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-8)
    }
  }

  /** Forward pass: (rawScores 2d×2d, targets 0..2d−1). */
  def forward(z1: DenseMatrix[Double], z2: DenseMatrix[Double],
      temperature: Double = 1.0): (DenseMatrix[Double], Array[Int]) = {
    require(z1.rows == z2.rows && z1.cols == z2.cols,
      s"view shape mismatch: ${z1.rows}x${z1.cols} vs ${z2.rows}x${z2.cols}")
    val d = z1.rows
    val sim11 = cosineBlock(z1, z1) / temperature
    val sim22 = cosineBlock(z2, z2) / temperature
    val sim12 = cosineBlock(z1, z2) / temperature
    var i = 0
    while (i < d) {
      sim11(i, i) = Double.NegativeInfinity
      sim22(i, i) = Double.NegativeInfinity
      i += 1
    }
    val top = DenseMatrix.horzcat(sim12, sim11)
    val bottom = DenseMatrix.horzcat(sim22, sim12.t.copy)
    (DenseMatrix.vertcat(top, bottom), Array.range(0, 2 * d))
  }

  /** Mean cross-entropy of the critic scores against their targets (the
    * consumer torch pairs with nn.CrossEntropyLoss). −∞ masks drop out
    * of the softmax naturally. */
  def loss(raw: DenseMatrix[Double], targets: Array[Int]): Double = {
    var total = 0.0
    var i = 0
    while (i < raw.rows) {
      var mx = Double.NegativeInfinity
      var k = 0
      while (k < raw.cols) { if (raw(i, k) > mx) mx = raw(i, k); k += 1 }
      var denom = 0.0
      k = 0
      while (k < raw.cols) {
        if (raw(i, k) != Double.NegativeInfinity)
          denom += math.exp(raw(i, k) - mx)
        k += 1
      }
      total += -(raw(i, targets(i)) - mx) + math.log(denom)
      i += 1
    }
    total / raw.rows
  }
}
