package graft.ml

import graft.SparkSpec
import graft.metrics.{ClusteringMetrics, Hungarian}
import graft.pipeline.SimulationNb
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {

  describe("GaussianNB (M1)") {
    import spark.implicits._
    // FIXTURES.md §1.3: 12 points, 2 features, 3 classes; golden
    // predictions computed with NumPy per sklearn's documented algorithm
    // (population variance + 1e-9 * max pooled variance smoothing).
    val train = Seq(
      ("a1", 0, Seq(1.0, 2.0)), ("a2", 0, Seq(1.5, 1.8)),
      ("a3", 0, Seq(0.8, 2.2)), ("a4", 0, Seq(1.2, 2.1)),
      ("b1", 1, Seq(5.0, 6.0)), ("b2", 1, Seq(5.5, 5.8)),
      ("b3", 1, Seq(4.8, 6.2)), ("b4", 1, Seq(5.2, 6.1)),
      ("c1", 2, Seq(9.0, 1.0)), ("c2", 2, Seq(9.5, 0.8)),
      ("c3", 2, Seq(8.8, 1.2)), ("c4", 2, Seq(9.2, 1.1))
    ).toDF("sample_id", "label_idx", "features")

    it("reproduces sklearn predictions on the golden fixture") {
      val model = GaussianNB.fit(train)
      val test = Seq(
        (Seq(1.1, 2.0), 0L), (Seq(5.1, 6.0), 1L), (Seq(9.1, 1.0), 2L),
        (Seq(3.0, 4.0), 0L), (Seq(7.0, 3.5), 1L), (Seq(0.0, 0.0), 0L)
      ).toDF("features", "expected")
      val scored = GaussianNB.predict(test, model)
      assert(scored.filter(col("pred") =!= col("expected")).count() == 0)
    }

    it("cross-validates with perfect accuracy on separable blobs") {
      val cv = GaussianNB.crossValidate(train, k = 4, seed = 2023)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(cv.size == 4)
      assert(cv.values.forall(_ == 1.0))
    }
  }

  describe("Clustering (M2/M13)") {
    import spark.implicits._
    val blobs = Seq(
      ("p1", Seq(0.0, 0.0)), ("p2", Seq(0.2, 0.1)), ("p3", Seq(0.1, 0.2)),
      ("p4", Seq(10.0, 10.0)), ("p5", Seq(10.2, 10.1)), ("p6", Seq(10.1, 9.9)),
      ("p7", Seq(0.0, 10.0)), ("p8", Seq(0.1, 10.2)), ("p9", Seq(0.2, 9.9))
    ).toDF("sample_id", "features")
      .withColumn("label", (monotonically_increasing_id() / 3).cast("long"))

    it("kmeans recovers separated blobs (ARI=1 after remap)") {
      val labeled = Seq(
        ("p1", 0L), ("p2", 0L), ("p3", 0L),
        ("p4", 1L), ("p5", 1L), ("p6", 1L),
        ("p7", 2L), ("p8", 2L), ("p9", 2L)).toDF("sample_id", "label")
      val pred = Clustering.kmeansPredict(blobs.drop("label"), k = 3)
        .join(labeled, "sample_id")
      assert(ClusteringMetrics.ari(pred) == 1.0)
      val (_, acc) = Hungarian.remap(pred)
      assert(acc == 1.0)
    }

    it("IVF quantizer survives a cache drop via persisted centroids (no re-fit)") {
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf")
        .resolve("model").toString
      val m1 = Clustering.kmeansModelCached("test-ivf-persist", blobs,
        k = 3, seed = 7, maxIter = 5, persistPath = Some(dir))
      Clustering.clearModelCacheForTest()
      // a re-fit on this 1-row frame could not reproduce m1; the load
      // path must win (uid is preserved by ML persistence, a fresh fit
      // would mint a new one)
      val m2 = Clustering.kmeansModelCached("test-ivf-persist",
        blobs.limit(1), k = 3, seed = 7, maxIter = 5,
        persistPath = Some(dir))
      assert(m2.uid == m1.uid, "quantizer was re-fit instead of loaded")
      assert(m2.clusterCenters.toSeq == m1.clusterCenters.toSeq)
    }

    it("pca projects to d dims and is deterministic") {
      val p = Clustering.pca(blobs, 2)
      val arr = p.select("pca").collect().map(_.getSeq[Double](0))
      assert(arr.forall(_.length == 2))
      val p2 = Clustering.pca(blobs, 2).select("pca")
        .collect().map(_.getSeq[Double](0))
      assert(arr.zip(p2).forall { case (a, b) => a == b })
    }
  }

  describe("DBSCAN / Birch (M3 — dormant in reference, over-delivered)") {
    import spark.implicits._
    // three tight 2-d blobs + one far outlier
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.2, 0.1)), (2L, Seq(0.1, 0.2)),
      (3L, Seq(10.0, 10.0)), (4L, Seq(10.2, 10.1)), (5L, Seq(10.1, 9.9)),
      (6L, Seq(0.0, 10.0)), (7L, Seq(0.1, 10.2)), (8L, Seq(0.2, 9.9)),
      (9L, Seq(50.0, 50.0))
    ).toDF("vec_id", "features")

    it("dbscan finds the blobs as clusters and flags the outlier as noise") {
      val res = Dbscan.fitPredict(pts, eps = 0.5, minPts = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(res(9L) == -1L, "far outlier must be noise")
      assert(Seq(0L, 1L, 2L).map(res).distinct.size == 1)
      assert(Seq(3L, 4L, 5L).map(res).distinct.size == 1)
      assert(Seq(6L, 7L, 8L).map(res).distinct.size == 1)
      assert(Seq(res(0L), res(3L), res(6L)).distinct.size == 3)
      // deterministic numbering: clusters ordered by smallest member id
      assert(res(0L) == 0L && res(3L) == 1L && res(6L) == 2L)
    }

    it("dbscan with sklearn-default minPts=5 marks 3-point blobs as noise") {
      val res = Dbscan.fitPredict(pts, eps = 0.5, minPts = 5)
        .collect().map(r => r.getLong(1))
      assert(res.forall(_ == -1L))
    }

    it("birch recovers the blobs at n_clusters=3 and is deterministic") {
      val clustered = pts.filter(col("vec_id") < 9)
      val r1 = Birch.fitPredict(clustered, nClusters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(0L, 1L, 2L).map(r1).distinct.size == 1)
      assert(Seq(3L, 4L, 5L).map(r1).distinct.size == 1)
      assert(Seq(6L, 7L, 8L).map(r1).distinct.size == 1)
      assert(Seq(r1(0L), r1(3L), r1(6L)).distinct.size == 3)
      val r2 = Birch.fitPredict(clustered, nClusters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(r1 == r2)
    }
  }

  describe("SimulationNb end-to-end (SURVEY §7.3)") {
    val file = "/root/reference/Simulation_Data/miRNA_seq_2_groups_1_diff.csv"

    it("runs ingest->split->scale->NB-CV and is seed-deterministic") {
      val cv1 = SimulationNb.run(spark, file).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
      val cv2 = SimulationNb.run(spark, file).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
      assert(cv1.length == 5)
      assert(cv1.sameElements(cv2))
      // 2 groups at max differential expression: NB on raw features
      // should beat chance clearly
      val mean = cv1.map(_._2).sum / 5
      assert(mean > 0.6, s"mean CV accuracy $mean")
      info(s"miRNA 2-group NB 5-fold accuracies: ${cv1.map(_._2).mkString(", ")}")
    }
  }
}
