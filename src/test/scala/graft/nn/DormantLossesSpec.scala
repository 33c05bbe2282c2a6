package graft.nn

import breeze.linalg.DenseMatrix
import graft.SparkSpec

/** Goldens computed independently with NumPy from the published
  * formulas (same harness as MetricsSpec). */
class DormantLossesSpec extends SparkSpec {

  private def m(rows: Seq[Seq[Double]]): DenseMatrix[Double] =
    DenseMatrix.tabulate(rows.length, rows.head.length)((r, c) => rows(r)(c))

  describe("ClusterLoss (M17/A14, dormant)") {
    it("matches the NumPy golden") {
      val ci = m(Seq(
        Seq(0.076308, 0.779919, 0.438409), Seq(0.723465, 0.97799, 0.538496),
        Seq(0.50112, 0.072051, 0.268439), Seq(0.499883, 0.67923, 0.803739),
        Seq(0.380941, 0.065936, 0.288146)))
      val cj = m(Seq(
        Seq(0.909594, 0.213385, 0.452124), Seq(0.931206, 0.024899, 0.600549),
        Seq(0.95013, 0.230303, 0.54849), Seq(0.909128, 0.133169, 0.523413),
        Seq(0.75041, 0.669013, 0.467753)))
      val l = DormantLosses.clusterLoss(ci, cj, temperature = 0.5)
      assert(math.abs(l - 1.8908601771432343) < 1e-6)
    }
  }

  describe("CCA loss (M19/A15, dormant)") {
    val h1 = m(Seq(
      Seq(0.204849, 0.490766, 0.372385), Seq(0.477401, 0.36589, 0.837918),
      Seq(0.768648, 0.313995, 0.572625), Seq(0.276049, 0.452843, 0.352978),
      Seq(0.657399, 0.370351, 0.459093), Seq(0.719324, 0.412992, 0.906423)))
    val h2 = m(Seq(
      Seq(0.180452, 0.741119, 0.422374), Seq(0.426454, 0.63438, 0.522906),
      Seq(0.414886, 0.001427, 0.092262), Seq(0.709394, 0.524346, 0.69616),
      Seq(0.955468, 0.682914, 0.053129), Seq(0.308853, 0.592595, 0.23512)))

    it("matches the NumPy goldens (all and top-k variants)") {
      val all = DormantLosses.ccaLoss(h1, h2, 2, useAllSingularValues = true)
      assert(math.abs(all - (-1.8725682281375122)) < 1e-6, all.toString)
      val top = DormantLosses.ccaLoss(h1, h2, 2, useAllSingularValues = false)
      assert(math.abs(top - (-1.5901047346226735)) < 1e-6, top.toString)
    }

    it("distributedGram matches the local outer-product sum") {
      val rows = (0 until 6).map(r =>
        Array.tabulate(3)(c => h1(r, c)))
      val g = DormantLosses.distributedGram(
        spark.sparkContext.parallelize(rows, 3), 3)
      val local = h1.t * h1
      for (i <- 0 until 3; j <- 0 until 3)
        assert(math.abs(g(i, j) - local(i, j)) < 1e-12)
    }
  }

  private val sf = "/root/testdata/sf0.001"

  describe("a14_usage_entropy ↔ negEntropy kernel") {
    it("the oracle-checked query equals negEntropy of the one-hot usage matrix") {
      val q = graft.SparkEntry.queries("a14_usage_entropy")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // rebuild each view's one-hot assignment matrix from the same table
      val rows = spark.read.parquet(s"$sf/embeddings.parquet")
        .selectExpr("vec_id % 2 AS view", "label").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      val labels = rows.map(_._2).distinct.sorted
      val k = labels.length
      for (view <- Seq(0L, 1L)) {
        val vs = rows.filter(_._1 == view).map(_._2)
        val onehot = DenseMatrix.tabulate(vs.length, k)((r, c) =>
          if (vs(r) == labels(c)) 1.0 else 0.0)
        val expected = DormantLosses.negEntropy(onehot)
        assert(math.abs(q(view) - (math.rint(expected * 1e6) / 1e6)) < 2e-6,
          s"view=$view query=${q(view)} kernel=$expected")
      }
    }

    it("zero-mass cluster columns NaN exactly like the reference " +
        "(the query ↔ kernel equivalence is scoped to all-present labels)") {
      // contrastive_loss.py:79-84 computes (p * torch.log(p)).sum():
      // torch NaNs on p=0 (0 · -inf), so the kernel must too — a
      // "fixed" 0·log 0 = 0 arm would silently deviate from reference
      // semantics. The a14 QUERY instead aggregates only labels that
      // occur (groupBy has no zero rows) and stays finite; equivalence
      // between the two holds on inputs where every label occurs in
      // every view, which the previous case exercises.
      val withEmpty = DenseMatrix.tabulate(4, 3)((r, c) =>
        if (c == 2) 0.0 else if (r % 2 == c) 1.0 else 0.0)
      assert(DormantLosses.negEntropy(withEmpty).isNaN,
        "zero-mass column must NaN like torch's p*log(p)")
      val allPresent = DenseMatrix.tabulate(4, 2)((r, c) =>
        if (r % 2 == c) 1.0 else 0.0)
      assert(!DormantLosses.negEntropy(allPresent).isNaN)
    }
  }

  describe("a15_cca_cov ↔ distributedGram covariance") {
    it("the oracle-checked covar_samp block equals the treeAggregate path") {
      val q = graft.SparkEntry.queries("a15_cca_cov")(spark, sf)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      // centered (a1..a4, b1..b4) rows through the A15 distributed path
      val raw = spark.read.parquet(s"$sf/embeddings.parquet")
        .selectExpr((1 to 4).map(i => s"CAST(embedding[${i - 1}] AS DOUBLE)") ++
          (1 to 4).map(j => s"CAST(embedding[${32 + j - 1}] AS DOUBLE)"): _*)
        .collect().map(r => Array.tabulate(8)(r.getDouble))
      val m = raw.length.toDouble
      val means = Array.tabulate(8)(c => raw.map(_(c)).sum / m)
      val centered = raw.map(row => Array.tabulate(8)(c => row(c) - means(c)))
      val g = DormantLosses.distributedGram(
        spark.sparkContext.parallelize(centered.toSeq, 3), 8)
      for (i <- 1 to 4; j <- 1 to 4) {
        val cov = g(i - 1, 4 + j - 1) / (m - 1)
        assert(math.abs(q((i, j)) - (math.rint(cov * 1e6) / 1e6)) < 2e-6,
          s"($i,$j) query=${q((i, j))} gram=$cov")
      }
    }
  }
}
