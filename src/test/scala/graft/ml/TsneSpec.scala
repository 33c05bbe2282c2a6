package graft.ml

import graft.SparkSpec
import graft.metrics.ClusteringMetrics

class TsneSpec extends SparkSpec {

  describe("Tsne (M12)") {
    import spark.implicits._
    lazy val blobs = {
      val rng = new java.util.Random(7)
      (0 until 60).map { i =>
        val c = i / 20 // 3 clusters in 10-d
        val center = Array.tabulate(10)(j => if (j % 3 == c) 8.0 else 0.0)
        (s"s$i", c.toLong,
          center.map(_ + rng.nextGaussian() * 0.3).toSeq)
      }.toDF("sample_id", "cluster", "features")
    }

    it("separates well-separated clusters in 2-D (kmeans ARI = 1)") {
      val y = Tsne.embed2d(blobs, cfg = Tsne.Config(perplexity = 10,
        iters = 600))
      assert(y.count() == 60)
      val arr = y.select("sample_id", "tsne_1", "tsne_2").collect()
      assert(arr.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN))
      // cluster the 2-D embedding; it must recover the original labels
      val feats = y.withColumn("features",
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.col("tsne_1"),
          org.apache.spark.sql.functions.col("tsne_2")))
      val pred = Clustering.kmeansPredict(feats, k = 3)
        .join(blobs.select("sample_id", "cluster"), "sample_id")
        .withColumnRenamed("cluster", "label")
      assert(ClusteringMetrics.ari(pred) == 1.0)
    }

    it("is deterministic given the seed") {
      val a = Tsne.embed2d(blobs, cfg = Tsne.Config(perplexity = 10,
        iters = 50)).collect().map(r => (r.getDouble(1), r.getDouble(2)))
      val b = Tsne.embed2d(blobs, cfg = Tsne.Config(perplexity = 10,
        iters = 50)).collect().map(r => (r.getDouble(1), r.getDouble(2)))
      assert(a.sameElements(b))
    }

    it("perplexity calibration hits the target entropy") {
      val rng = new java.util.Random(3)
      val x = breeze.linalg.DenseMatrix.tabulate(30, 5)((_, _) =>
        rng.nextGaussian())
      val d2 = breeze.linalg.DenseMatrix.tabulate(30, 30) { (i, j) =>
        var acc = 0.0
        for (c <- 0 until 5) { val d = x(i, c) - x(j, c); acc += d * d }
        acc
      }
      val p = Tsne.jointProbabilities(d2, perplexity = 8)
      // symmetric, rows sum to ~1/n each (joint normalization)
      assert(breeze.linalg.sum(p) > 0.99 && breeze.linalg.sum(p) < 1.01)
      for (i <- 0 until 30; j <- 0 until 30)
        assert(math.abs(p(i, j) - p(j, i)) < 1e-12)
    }
  }
}
