package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector}

/** Composite loss terms over named graph outputs. Each term returns
  * (loss, gradients per output name); the trainer sums terms — exactly
  * the reference compositions (M20/M21):
  *   CNC/X/MM/JISAE: recon only (JISAE_selection.py:330)
  *   JISAE-O1/2/3:   recon + mult·ortho (JISAE-O{1,2,3}_selection.py)
  *   MOCSS:          ortho + contrastive + mult·recon
  *                   (MOCSS_AE_model_selection.py:291, temperature 0.4)
  * All gradients are validated by finite differences in NnGraphSpec.
  */
sealed trait LossTerm extends Serializable {
  def compute(outs: Map[String, DenseMatrix[Double]],
      x1: DenseMatrix[Double], x2: DenseMatrix[Double])
      : (Double, Map[String, DenseMatrix[Double]])
}

object LossTerm {

  /** dL/dRaw given raw matrix, its row-normalized form + norms, and
    * dL/dNormalized (projection through row normalization). */
  private[nn] def normBackward(aHat: DenseMatrix[Double],
      norms: DenseVector[Double], g: DenseMatrix[Double])
      : DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](aHat.rows, aHat.cols)
    var r = 0
    while (r < aHat.rows) {
      var dot = 0.0; var c = 0
      while (c < aHat.cols) { dot += aHat(r, c) * g(r, c); c += 1 }
      c = 0
      while (c < aHat.cols) {
        out(r, c) = (g(r, c) - aHat(r, c) * dot) / norms(r); c += 1
      }
      r += 1
    }
    out
  }
}

/** CustomLoss recon term: weight · ‖rownorm(out)−rownorm(target view)‖_F
  * (CNC_AE_model_selection.py:209-229). */
final case class ReconTerm(out: String, view: Int, weight: Double = 1.0)
    extends LossTerm {
  def compute(outs: Map[String, DenseMatrix[Double]],
      x1: DenseMatrix[Double], x2: DenseMatrix[Double])
      : (Double, Map[String, DenseMatrix[Double]]) = {
    val target = if (view == 0) x1 else x2
    val (l, g) = Kernel.frobeniusNormalizedLoss(outs(out), target)
    (weight * l, Map(out -> (g * weight)))
  }
}

/** O1 ortho: weight · mean(rownorm(a) ⊙ rownorm(b))
  * (JISAE-O1_selection.py:266-293; model_structures.py:1466-1474). */
final case class OrthoO1Term(a: String, b: String, weight: Double)
    extends LossTerm {
  def compute(outs: Map[String, DenseMatrix[Double]],
      x1: DenseMatrix[Double], x2: DenseMatrix[Double])
      : (Double, Map[String, DenseMatrix[Double]]) = {
    val (ah, an) = Kernel.rowNormalize(outs(a))
    val (bh, bn) = Kernel.rowNormalize(outs(b))
    val nd = ah.rows.toDouble * ah.cols
    var l = 0.0
    var r = 0
    while (r < ah.rows) {
      var c = 0
      while (c < ah.cols) { l += ah(r, c) * bh(r, c); c += 1 }
      r += 1
    }
    l /= nd
    val gA = LossTerm.normBackward(ah, an, bh * (weight / nd))
    val gB = LossTerm.normBackward(bh, bn, ah * (weight / nd))
    (weight * l, Map(a -> gA, b -> gB))
  }
}

/** O2 ortho: weight · Σ_rows (rownorm(a)_i · rownorm(b)_i)²
  * (JISAE-O2_selection.py:266-305). */
final case class OrthoO2Term(a: String, b: String, weight: Double)
    extends LossTerm {
  def compute(outs: Map[String, DenseMatrix[Double]],
      x1: DenseMatrix[Double], x2: DenseMatrix[Double])
      : (Double, Map[String, DenseMatrix[Double]]) = {
    val (ah, an) = Kernel.rowNormalize(outs(a))
    val (bh, bn) = Kernel.rowNormalize(outs(b))
    var l = 0.0
    val gNormA = DenseMatrix.zeros[Double](ah.rows, ah.cols)
    val gNormB = DenseMatrix.zeros[Double](bh.rows, bh.cols)
    var r = 0
    while (r < ah.rows) {
      var dot = 0.0; var c = 0
      while (c < ah.cols) { dot += ah(r, c) * bh(r, c); c += 1 }
      l += dot * dot
      c = 0
      while (c < ah.cols) {
        gNormA(r, c) = 2 * dot * bh(r, c) * weight
        gNormB(r, c) = 2 * dot * ah(r, c) * weight
        c += 1
      }
      r += 1
    }
    (weight * l, Map(a -> LossTerm.normBackward(ah, an, gNormA),
      b -> LossTerm.normBackward(bh, bn, gNormB)))
  }
}

/** O3 ortho: weight · Σ_dims (column dot of rownormalized a, b)²
  * (JISAE-O3_selection.py:266-300). */
final case class OrthoO3Term(a: String, b: String, weight: Double)
    extends LossTerm {
  def compute(outs: Map[String, DenseMatrix[Double]],
      x1: DenseMatrix[Double], x2: DenseMatrix[Double])
      : (Double, Map[String, DenseMatrix[Double]]) = {
    val (ah, an) = Kernel.rowNormalize(outs(a))
    val (bh, bn) = Kernel.rowNormalize(outs(b))
    val colDot = DenseVector.zeros[Double](ah.cols)
    var r = 0
    while (r < ah.rows) {
      var c = 0
      while (c < ah.cols) { colDot(c) += ah(r, c) * bh(r, c); c += 1 }
      r += 1
    }
    var l = 0.0
    var c = 0
    while (c < ah.cols) { l += colDot(c) * colDot(c); c += 1 }
    val gNormA = DenseMatrix.tabulate(ah.rows, ah.cols)((r2, c2) =>
      2 * colDot(c2) * bh(r2, c2) * weight)
    val gNormB = DenseMatrix.tabulate(bh.rows, bh.cols)((r2, c2) =>
      2 * colDot(c2) * ah(r2, c2) * weight)
    (weight * l, Map(a -> LossTerm.normBackward(ah, an, gNormA),
      b -> LossTerm.normBackward(bh, bn, gNormB)))
  }
}

/** M16 — NT-Xent instance contrastive loss on two row-normalized heads
  * (Simulation_Auxiliary/contrastive_loss.py:8-67: sim = z·zᵀ/τ over the
  * 2B stacked rows, positives at ±B, self and partner masked out of the
  * negatives, CrossEntropy sum / 2B). Batch-local math (B ≤ 512). */
final case class NtXentTerm(a: String, b: String, temperature: Double,
    weight: Double = 1.0) extends LossTerm {
  def compute(outs: Map[String, DenseMatrix[Double]],
      x1: DenseMatrix[Double], x2: DenseMatrix[Double])
      : (Double, Map[String, DenseMatrix[Double]]) = {
    val (ah, an) = Kernel.rowNormalize(outs(a))
    val (bh, bn) = Kernel.rowNormalize(outs(b))
    val bsz = ah.rows
    val n = 2 * bsz
    val z = DenseMatrix.vertcat(ah, bh)
    val sim = (z * z.t) / temperature

    def partner(i: Int): Int = if (i < bsz) i + bsz else i - bsz

    // softmax over allowed logits per row: {partner} ∪ {k != i, partner}
    var loss = 0.0
    val gSim = DenseMatrix.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var mx = Double.NegativeInfinity
      var k = 0
      while (k < n) {
        if (k != i && sim(i, k) > mx) mx = sim(i, k)
        k += 1
      }
      var denom = 0.0
      k = 0
      while (k < n) {
        if (k != i) denom += math.exp(sim(i, k) - mx)
        k += 1
      }
      val p = partner(i)
      loss += -(sim(i, p) - mx) + math.log(denom)
      k = 0
      while (k < n) {
        if (k != i) {
          val soft = math.exp(sim(i, k) - mx) / denom
          gSim(i, k) = (soft - (if (k == p) 1.0 else 0.0)) / n
        }
        k += 1
      }
      i += 1
    }
    loss /= n

    // dZ = (G + Gᵀ)·z / τ
    val dZ = ((gSim + gSim.t) * z) / temperature
    val gNormA = dZ(0 until bsz, ::).copy * weight
    val gNormB = dZ(bsz until n, ::).copy * weight
    (weight * loss, Map(a -> LossTerm.normBackward(ah, an, gNormA),
      b -> LossTerm.normBackward(bh, bn, gNormB)))
  }
}
