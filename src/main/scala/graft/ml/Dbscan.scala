package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** M3a — DBSCAN with sklearn-default semantics (eps=0.5, min_samples=5,
  * euclidean). Dormant in the reference: `DBSCAN()` is instantiated but
  * never fit (Simulation_Auxiliary/mocss.py:410, mocss_survival.py:415)
  * — implemented as over-delivery with golden specs, same policy as the
  * dormant losses.
  *
  * Distributed shape: neighbor counting and core-edge generation run as
  * a broadcast self-join with a codegen'd squared-distance filter — the
  * quadratic verify is spread across executors, and only CORE↔CORE
  * edges (tiny at the dormant operator's reference scale, n≈10³) reach
  * the driver for the union-find finish. A 100 TB deployment would
  * bucket candidates first (the x11/y4 LSH prefilter) — plumbing this
  * operator never needs in the reference, where it is never even fit.
  *
  * Determinism note: sklearn assigns border points to the first core
  * point in scan order (input-order-dependent); here border points join
  * their NEAREST core neighbor (ties → smallest cluster id) and cluster
  * ids are numbered by smallest member id — deterministic under any
  * partitioning, identical partition structure vs sklearn up to label
  * permutation (which NMI/ARI, the reference's only consumers, ignore).
  */
object Dbscan {

  /** Returns (idCol, cluster) — cluster = −1 marks noise. */
  def fitPredict(df: DataFrame, idCol: String = "vec_id",
      featuresCol: String = "features", eps: Double = 0.5,
      minPts: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val a = df.select(col(idCol).cast("long").as("ida"),
      col(featuresCol).as("fa"))
    val b = df.select(col(idCol).cast("long").as("idb"),
      col(featuresCol).as("fb"))
    val d2 = aggregate(
      zip_with(col("fa"), col("fb"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    // ε-neighbor pairs (self excluded; sklearn's count includes self —
    // handled in the core rule below)
    val pairs = a.join(broadcast(b), col("ida") =!= col("idb"))
      .withColumn("d2", d2)
      .filter(col("d2") <= eps * eps)
      .select("ida", "idb", "d2")
      .cache()

    val coreIds = pairs.groupBy("ida").agg(count(lit(1)).as("nn"))
      .filter(col("nn") + 1 >= minPts) // +1: the point itself
      .select(col("ida")).as[Long].collect().toSet

    // union-find over core↔core edges
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    // only core↔core edges reach the driver (semi-joined distributed)
    val coreDf = coreIds.toSeq.toDF("cid")
    pairs.filter(col("ida") < col("idb"))
      .join(broadcast(coreDf), col("ida") === col("cid"), "left_semi")
      .join(broadcast(coreDf), col("idb") === col("cid"), "left_semi")
      .select("ida", "idb").as[(Long, Long)].collect()
      .foreach { case (x, y) => union(x, y) }
    // roots → dense cluster ids ordered by smallest member (deterministic)
    val root = coreIds.map(c => c -> find(c)).toMap
    val clusterOf = root.values.toSeq.distinct.sorted.zipWithIndex
      .map { case (r, i) => r -> i.toLong }.toMap
    val coreCluster = root.map { case (c, r) => c -> clusterOf(r) }

    // border points: nearest core neighbor's cluster (ties → min id)
    val coreClusterDf = coreCluster.toSeq.toDF("cid", "cluster")
    val borderAssign = pairs
      .join(broadcast(coreClusterDf), col("idb") === col("cid"))
      .groupBy("ida")
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .select(col("ida").as(idCol), col("best.cluster").as("bcluster"))

    val out = df.select(col(idCol).cast("long").as(idCol))
      .join(broadcast(coreCluster.toSeq.toDF(idCol, "ccluster")),
        Seq(idCol), "left")
      .join(broadcast(borderAssign), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("ccluster"), col("bcluster"), lit(-1L)).as("cluster"))
    pairs.unpersist()
    out
  }
}
