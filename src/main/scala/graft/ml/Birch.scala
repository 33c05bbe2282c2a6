package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** M3b — Birch-style clustering (CF subclustering + global merge),
  * sklearn `Birch(n_clusters=k)` semantics with the default
  * threshold=0.5. Dormant in the reference: instantiated, never fit
  * (Simulation_Auxiliary/mocss.py:411) — over-delivery with goldens.
  *
  * Shape (Birch's own design intent — one pass, bounded sketch):
  *  1. each PARTITION streams its rows into local CF entries
  *     (n, LS, SS), absorbing a point into its nearest subcluster when
  *     the post-absorb radius √(SS/n − ‖LS/n‖²) stays ≤ threshold;
  *  2. the per-partition CF entries (a bounded sketch, ≪ data) are
  *     merged on the driver by the same absorption rule;
  *  3. subcluster centroids are agglomerated to `nClusters` by Ward's
  *     criterion (n_i·n_j/(n_i+n_j)·‖c_i−c_j‖², driver-side — the
  *     subcluster count is small by construction);
  *  4. every row is assigned distributed-ly to its nearest subcluster
  *     centroid's merged label (sklearn's predict rule).
  *
  * Like sklearn's, the CF build is input-order-dependent; with a fixed
  * partitioning the result is deterministic (spec-asserted). The
  * branching factor is an efficiency knob for the in-memory tree walk,
  * not part of the model — the flat entry list keeps this honest at the
  * dormant operator's reference scale while the per-partition pass is
  * what a 100 TB run needs anyway.
  */
object Birch {

  private final class CF(val dim: Int) {
    var n = 0L
    val ls = new Array[Double](dim)
    val ss = Array(0.0) // scalar Σ‖x‖²
    def absorb(x: Array[Double]): Unit = {
      var i = 0
      while (i < dim) { ls(i) += x(i); ss(0) += x(i) * x(i); i += 1 }
      n += 1
    }
    def merge(o: CF): Unit = {
      var i = 0
      while (i < dim) { ls(i) += o.ls(i); i += 1 }
      ss(0) += o.ss(0); n += o.n
    }
    def centroid: Array[Double] = ls.map(_ / n)
    /** radius if `x` were absorbed (x == null → current radius). */
    def radiusWith(x: Array[Double]): Double = {
      val nn = n + (if (x == null) 0 else 1)
      var ss2 = ss(0); val ls2 = ls.clone()
      if (x != null) {
        var i = 0
        while (i < dim) { ls2(i) += x(i); ss2 += x(i) * x(i); i += 1 }
      }
      val m2 = ls2.map(v => v / nn).map(v => v * v).sum
      math.sqrt(math.max(0.0, ss2 / nn - m2))
    }
  }

  private def absorbInto(entries: ArrayBuffer[CF], x: Array[Double],
      threshold: Double, dim: Int): Unit = {
    var best = -1; var bestD = Double.MaxValue
    var j = 0
    while (j < entries.length) {
      val c = entries(j).centroid
      var d = 0.0; var i = 0
      while (i < dim) { val t = c(i) - x(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    if (best >= 0 && entries(best).radiusWith(x) <= threshold) {
      entries(best).absorb(x)
    } else {
      val cf = new CF(dim); cf.absorb(x); entries += cf
    }
  }

  /** Returns (idCol, cluster) with `nClusters` clusters. */
  def fitPredict(df: DataFrame, nClusters: Int, idCol: String = "vec_id",
      featuresCol: String = "features",
      threshold: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    val dim = df.select(size(col(featuresCol))).head().getInt(0)

    // 1. per-partition CF pass; 2. driver merge by the same rule
    val partials = df.select(col(featuresCol)).rdd
      .mapPartitions { it =>
        val entries = ArrayBuffer.empty[CF]
        it.foreach { r =>
          val x = r.getSeq[Any](0).map {
            case d: Double => d
            case f: Float => f.toDouble
          }.toArray
          absorbInto(entries, x, threshold, dim)
        }
        entries.iterator.map(c => (c.n, c.ls.toSeq, c.ss(0)))
      }.collect()
    val entries = ArrayBuffer.empty[CF]
    partials.foreach { case (n, ls, ss) =>
      val cf = new CF(dim)
      cf.n = n; ls.copyToArray(cf.ls); cf.ss(0) = ss
      // re-absorb the partial as a unit if its centroid fits, else keep
      var best = -1; var bestD = Double.MaxValue
      val c0 = cf.centroid
      var j = 0
      while (j < entries.length) {
        val c = entries(j).centroid
        var d = 0.0; var i = 0
        while (i < dim) { val t = c(i) - c0(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      if (best >= 0) {
        val probe = new CF(dim); probe.merge(entries(best)); probe.merge(cf)
        if (probe.radiusWith(null) <= threshold) entries(best).merge(cf)
        else entries += cf
      } else entries += cf
    }

    // 3. Ward agglomeration of subcluster centroids to nClusters
    val subs = ArrayBuffer.empty[(Long, Array[Double])] // (n, centroid)
    entries.foreach(e => subs += ((e.n, e.centroid)))
    val label = ArrayBuffer.tabulate(subs.length)(identity)
    var active = subs.indices.to(ArrayBuffer)
    while (active.length > nClusters) {
      var bi = -1; var bj = -1; var bd = Double.MaxValue
      for (ii <- active.indices; jj <- ii + 1 until active.length) {
        val (na, ca) = subs(active(ii))
        val (nb, cb) = subs(active(jj))
        var d = 0.0; var i = 0
        while (i < dim) { val t = ca(i) - cb(i); d += t * t; i += 1 }
        val ward = na.toDouble * nb / (na + nb) * d
        if (ward < bd) { bd = ward; bi = ii; bj = jj }
      }
      val (ia, ib) = (active(bi), active(bj))
      val (na, ca) = subs(ia); val (nb, cb) = subs(ib)
      val merged = (na + nb,
        ca.zip(cb).map { case (x, y) => (na * x + nb * y) / (na + nb) })
      subs(ia) = merged
      label.indices.foreach(i => if (label(i) == ib) label(i) = ia)
      active.remove(bj)
    }
    val dense = active.zipWithIndex.toMap
    val finalLabel = label.map(l => dense(
      Iterator.iterate(l)(label(_)).dropWhile(x => !dense.contains(x))
        .next()).toLong)

    // 4. distributed assignment: nearest subcluster centroid's label
    import spark.implicits._
    val cdf = entries.indices
      .map(i => (i.toLong, entries(i).centroid.toSeq, finalLabel(i)))
      .toDF("sub", "centroid", "cluster")
    val d2 = aggregate(
      zip_with(col(featuresCol), col("centroid"),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)
    df.select(col(idCol), col(featuresCol))
      .crossJoin(broadcast(cdf))
      .withColumn("d2", d2)
      .groupBy(idCol)
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .select(col(idCol), col("best.cluster").as("cluster"))
  }
}
