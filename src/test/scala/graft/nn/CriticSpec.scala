package graft.nn

import breeze.linalg.DenseMatrix
import org.scalatest.funspec.AnyFunSpec

/** M18 LinearCritic goldens — expected values computed independently
  * with NumPy from the torch semantics (critic.py:5-24): pairwise cosine
  * blocks / temperature, sim11/sim22 diagonals masked to −∞, block
  * layout [[sim12, sim11], [sim22, sim12ᵀ]], targets = 0..2d−1.
  */
class CriticSpec extends AnyFunSpec {

  private def eps(a: Double, b: Double, tol: Double = 1e-12) =
    assert(math.abs(a - b) <= tol, s"$a vs $b")

  private val z1 = DenseMatrix((1.0, 0.0, 0.0), (0.0, 1.0, 0.0))
  private val z2 = DenseMatrix((1.0, 1.0, 0.0), (0.0, 0.0, 1.0))

  it("builds the 2d x 2d raw-score matrix with masked self-sims") {
    val (raw, targets) = Critic.forward(z1, z2, temperature = 0.5)
    assert(raw.rows == 4 && raw.cols == 4)
    assert(targets.sameElements(Array(0, 1, 2, 3)))
    val r2 = math.sqrt(2.0) // cos(45°)/0.5
    // row 0: [sim12(0,·)=(√2, 0), sim11(0,·)=(−∞, 0)]
    eps(raw(0, 0), r2); eps(raw(0, 1), 0.0)
    assert(raw(0, 2).isNegInfinity); eps(raw(0, 3), 0.0)
    // row 1: sim11 diagonal masked at (1,3)
    eps(raw(1, 0), r2); eps(raw(1, 1), 0.0)
    eps(raw(1, 2), 0.0); assert(raw(1, 3).isNegInfinity)
    // row 2: [sim22(0,·)=(−∞, 0), sim12ᵀ(0,·)=(√2, √2)]
    assert(raw(2, 0).isNegInfinity); eps(raw(2, 1), 0.0)
    eps(raw(2, 2), r2); eps(raw(2, 3), r2)
    // row 3: [sim22(1,·)=(0, −∞), sim12ᵀ(1,·)=(0, 0)]
    eps(raw(3, 0), 0.0); assert(raw(3, 1).isNegInfinity)
    eps(raw(3, 2), 0.0); eps(raw(3, 3), 0.0)
  }

  it("cross-entropy against targets matches the NumPy golden") {
    val (raw, targets) = Critic.forward(z1, z2, temperature = 0.5)
    eps(Critic.loss(raw, targets), 1.028295560401736, 1e-12)
  }

  it("identical views with tau=1 put the maximum on the positive pair") {
    val (raw, targets) = Critic.forward(z1, z1, temperature = 1.0)
    // row 0 positive = cos(z1_0, z1_0) = 1, strictly above every other
    // finite entry in the row
    val row0 = (0 until raw.cols).map(raw(0, _))
    eps(row0(targets(0)), 1.0)
    assert(row0.zipWithIndex.filter(_._2 != 0).forall(_._1 < 1.0))
  }
}
