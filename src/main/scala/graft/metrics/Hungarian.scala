package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M7 — Hungarian (Kuhn-Munkres) cluster→label assignment and remapped
  * accuracy (ref: Simulation_Auxiliary/evaluation.py:34-53, cost matrix
  * built at :15-23 as cost[j,i] = colsum(C[:,j]) − C[i,j]).
  *
  * The contingency table is computed distributed (k×k rows); the k×k
  * assignment itself is solved on the driver with the standard O(k³)
  * potentials formulation (classic published algorithm — Kuhn 1955,
  * Jonker-Volgenant refinements) — k ≤ 6 in the reference.
  */
object Hungarian {

  /** Minimum-cost assignment of n rows to n cols. Returns col assigned to
    * each row. O(n³). */
  def solve(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    val u = new Array[Double](n + 1)
    val v = new Array[Double](n + 1)
    val p = new Array[Int](n + 1) // p(j) = row matched to col j (1-based)
    val way = new Array[Int](n + 1)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(n + 1)(Double.PositiveInfinity)
      val used = new Array[Boolean](n + 1)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Double.PositiveInfinity
        var j1 = -1
        for (j <- 1 to n if !used(j)) {
          val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
          if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
          if (minv(j) < delta) { delta = minv(j); j1 = j }
        }
        for (j <- 0 to n) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
        }
        j0 = j1
        if (p(j0) == 0) done = true
      }
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
    }
    val ans = new Array[Int](n)
    for (j <- 1 to n) if (p(j) > 0) ans(p(j) - 1) = j - 1
    ans
  }

  /** Best pred→label mapping maximizing matched counts (reference cost
    * construction), from a distributed contingency. Returns the mapping
    * and the remapped accuracy. */
  def remap(df: DataFrame, labelCol: String = "label",
      predCol: String = "pred"): (Map[Any, Any], Double) = {
    val cont = ClusteringMetrics.contingency(df, labelCol, predCol)
      .collect()
      .map(r => (r.get(0), r.get(1), r.getLong(2)))
    val labels = cont.map(_._1).distinct.sortBy(_.toString)
    val preds = cont.map(_._2).distinct.sortBy(_.toString)
    val k = math.max(labels.length, preds.length)
    val counts = Array.ofDim[Double](k, k)
    val lIdx = labels.zipWithIndex.toMap
    val pIdx = preds.zipWithIndex.toMap
    cont.foreach { case (l, p, c) => counts(pIdx(p))(lIdx(l)) = c.toDouble }
    // maximize matches == minimize (colsum − C) per the reference
    val colSums = (0 until k).map(j => counts.map(_(j)).sum).toArray
    val cost = Array.tabulate(k, k)((i, j) => colSums(j) - counts(i)(j))
    val assign = solve(cost)
    val mapping: Map[Any, Any] = preds.indices.map(i =>
      preds(i) -> (if (assign(i) < labels.length) labels(assign(i))
                   else null.asInstanceOf[Any])
    ).toMap
    val total = cont.map(_._3).sum.toDouble
    val matched = cont.collect {
      case (l, p, c) if mapping(p) == l => c
    }.sum.toDouble
    (mapping, matched / total)
  }
}
