package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** IVF search quality/cost at a SATURATED quantizer ceiling — the y5/y7
  * half of the r13 quantizer-ceiling lift (the y8 half is
  * [[SemDedupProbe]]'s forced-regime mode).
  *
  * For SEARCH the ceiling's failure mode is different from dedup's: a
  * capped k makes cell occupancy n/k grow linearly, so the per-query
  * probe scan — nProbe·n/k candidates — grows linearly too (recall
  * often SURVIVES, because fatter cells contain more true neighbors;
  * the envelope that breaks is COST). This probe measures both, per
  * arm, against brute-force ground truth:
  *  - `flat-forced`: [[SimilarityOps.ivfCentroids]] with the ceiling
  *    forced to `cap` (`-D` prop) — the pre-r13 saturated behavior
  *    recreated at a corpus this box holds;
  *  - `scaled`: [[SimilarityOps.scaledIvfQuantizer]]'s two-level
  *    sampled fit at k = ⌈√n⌉ uncapped; routing ranks the flat
  *    sub-centroid table driver-side (identical nProbe semantics),
  *    assignment is the hierarchical argmin — so the reported recall
  *    also prices the boundary-vector approximation the hierarchy
  *    introduces.
  *
  * Run: `sbt "runMain graft.AnnScaleProbe /tmp/graft_probe_x1000e 64"`
  * → BENCH_SCALES.md §r13 quantizer ceiling (search).
  */
object AnnScaleProbe {

  private val NQueries = 20
  private val TopK = 3
  private val NProbe = 2

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_probe_x100")
    val cap = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Sessions.builder("local[16]", "32")
      .appName("graft-ann-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = SimilarityOps.checkedEmbeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()

    val queries: Array[(Long, Seq[Float])] = emb
      .filter(col("vec_id") < NQueries)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    /** Per-query top-k over the candidate frame `(qid, cell, qe)` joined
      * to a corpus frame carrying `cell` — the y5 pipeline shape with
      * driver-side routing (identical for both arms, so the arms differ
      * ONLY in quantizer geometry). Returns (topk map, candidate count,
      * seconds for the scoring pass). */
    def runArm(corpus: DataFrame,
        probed: Map[Long, Seq[Long]]): (Map[Long, Seq[Long]], Long, Double) = {
      val probeRows = queries.flatMap { case (qid, qe) =>
        probed(qid).map(c => (qid, c, qe))
      }.toSeq
      val probeDf = broadcast(
        spark.createDataFrame(probeRows).toDF("qid", "cell", "qe"))
      val cand = corpus.join(probeDf, "cell")
        .filter(col("nid") =!= col("qid"))
      val nCand = cand.count()
      val w = Window.partitionBy("qid")
        .orderBy(col("cos_sim").desc, col("nid"))
      val (got, secs) = time {
        cand.select(col("qid"), col("nid"),
            round(SimilarityOps.fastCosine(col("qe"), col("ne")), 4)
              .as("cos_sim"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= TopK)
          .select("qid", "nid")
          .collect().groupBy(_.getLong(0))
          .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSeq }
      }
      (got, nCand, secs)
    }

    def recallVs(truth: Map[Long, Set[Long]],
        got: Map[Long, Seq[Long]]): Double =
      queries.map { case (qid, _) =>
        got.getOrElse(qid, Nil).count(truth(qid)).toDouble / TopK
      }.sum / queries.length

    // ground truth: brute-force cosine top-k per query (y3 shape)
    val qDf = broadcast(spark.createDataFrame(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(queries))
      .toDF("qid", "qe"))
    val wT = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    val (truth, truthSecs) = time {
      emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
        .crossJoin(qDf)
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          round(SimilarityOps.fastCosine(col("qe"), col("ne")), 4)
            .as("cos_sim"))
        .withColumn("rk", row_number().over(wT))
        .filter(col("rk") <= TopK)
        .select("qid", "nid")
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    }
    println(f"[annscale] dir=$dir n=$n brute-force truth: $truthSecs%.1f s")

    // arm 1: flat fit forced to the cap (pre-r13 saturated ceiling)
    val prevCap = sys.props.get("graft.ivf.quantCap")
    val (flatCents, flatFitSecs) = try {
      sys.props("graft.ivf.quantCap") = cap.toString
      time(SimilarityOps.ivfCentroids(spark, dir))
    } finally prevCap match {
      case Some(p) => sys.props("graft.ivf.quantCap") = p
      case None => sys.props.remove("graft.ivf.quantCap")
    }
    val flatCorpus = emb.select(col("vec_id").as("nid"),
      col("embedding").as("ne"),
      SimilarityOps.ivfCellExpr(col("embedding"), flatCents).as("cell"))
    val flatProbes = queries.map { case (qid, qe) =>
      qid -> SimilarityOps.nearestCells(flatCents,
        qe.map(_.toDouble), NProbe)
    }.toMap
    val (flatGot, flatCand, flatSecs) = runArm(flatCorpus, flatProbes)
    println(f"[annscale] arm=flat-forced-cap$cap k=${flatCents.length} " +
      f"fit=$flatFitSecs%.1fs scan=$flatSecs%.1fs candidates=$flatCand " +
      f"recall@$TopK=${recallVs(truth, flatGot)}%.3f")

    // arm 2: scaled two-level fit at k = ceil(sqrt(n)), no ceiling
    val (q2, scaledFitSecs) = time(SimilarityOps.scaledIvfQuantizer(spark, dir))
    val scaledCorpus = emb.select(col("vec_id").as("nid"),
      col("embedding").as("ne"),
      graft.functions.TwoLevelNearestCell
        .two_level_cell(col("embedding"), q2.coarse, q2.sub).as("cell"))
    val scaledProbes = queries.map { case (qid, qe) =>
      qid -> SimilarityOps.nearestCells(q2.sub, qe.map(_.toDouble), NProbe)
    }.toMap
    val (scaledGot, scaledCand, scaledSecs) = runArm(scaledCorpus, scaledProbes)
    println(f"[annscale] arm=scaled k=${q2.k} (${q2.k1}x${q2.k2}) " +
      f"fit=$scaledFitSecs%.1fs scan=$scaledSecs%.1fs candidates=$scaledCand " +
      f"recall@$TopK=${recallVs(truth, scaledGot)}%.3f")
    spark.stop()
  }
}
