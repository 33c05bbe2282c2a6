package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AnnEval, SimilarityOps}

/** ANN recall at probe scale: the BENCH_SCALES blow-ups established the
  * y-family's TIME behavior across decades; this measures its ANSWER
  * QUALITY there — recall against exact brute force on the same blown
  * corpus, because a sub-linear index that stops finding the true
  * neighbors is not an optimization. The blow-up is the statistics-
  * invariant ScaleProbe one (hash-keyed ±0.022 perturbation, distinct
  * vectors, no degenerate equal-vector buckets).
  *
  * Ground truths: exact cosine top-3 per qid<20 (y4 LSH / y5 IVF rank
  * by cosine) and exact L2 top-10 for qid 0 (y6 PQ-ADC / y7 IVF-PQ rank
  * by ADC-approximated squared L2). Each family re-FITS its index on
  * the blown corpus (fit-once caches key on the data dir), so cell
  * counts / code books / signature widths are the ones the engine would
  * choose at that corpus size.
  *
  * Run: `sbt "runMain graft.AnnRecallProbe 10"` (then 100). Findings →
  * SCALE.md §ANN recall.
  */
object AnnRecallProbe {

  private def topL2(corpus: DataFrame, q: Seq[Double], k: Int): DataFrame =
    corpus.filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("nid"),
        aggregate(zip_with(col("embedding"), typedLit(q),
            (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
      .orderBy(col("d2"), col("nid"))
      .limit(k)
      .select("nid")

  /** Threshold recall@k, the tie-robust form: an approx neighbor is a
    * hit when its TRUE score is at least as good as the k-th exact
    * score for that query. Plain id-set overlap under-reports here by
    * construction — each query has factor−1 near-copies whose cosines
    * tie at the 4-dp rounding the contract queries emit, so id ORDER
    * among true ties is arbitrary (a first run scored every family at
    * exactly 0.900 on id-overlap: pure tie shuffling, zero real loss). */
  private def recall(approx: Seq[(Long, Long)], kth: Map[Long, Double],
      score: (Long, Long) => Double, better: (Double, Double) => Boolean,
      k: Int): Double = {
    val per = kth.map { case (q, t) =>
      val hits = approx.filter(_._1 == q)
        .count { case (_, nid) => better(score(q, nid), t) }
      math.min(hits, k).toDouble / k
    }
    per.sum / per.size
  }

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.select(col(df.columns.head).cast("long"),
        col(df.columns(1)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.builder("local[16]", "32")
      .appName(s"graft-ann-recall-x$factor").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/tmp/graft_annrecall_x$factor"
    ScaleProbe.blowUpEmbeddings(
        spark.read.parquet(s"$src/embeddings.parquet"), factor)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val corpus = SimilarityOps.checkedEmbeddings(spark, dir)
    val n = corpus.count()
    println(s"[recall] corpus x$factor = $n vectors")

    // cosine ground truth, qids 0..19, k=3 (y4/y5's own shape) — the
    // SHARED methodology implementation (AnnEval), which
    // BlowupRecallSpec pins in CI so probe and spec cannot drift
    val exact3 = pairs(AnnEval.exactCosineTopK(corpus, 20, 3))
    val y5 = pairs(SparkEntry.queries("y5_ivf_ann")(spark, dir)
      .select("qid", "nid"))
    val y4 = pairs(SimilarityOps.lshTopK(corpus, k = 3, maxQid = Some(20))
      .select("qid", "nid"))
    // L2 ground truth, qid 0, k=10 (y6/y7's own shape)
    val q0 = corpus.filter(col("vec_id") === 0).head()
      .getSeq[Float](1).map(_.toDouble).toSeq
    val exactL2 = pairs(topL2(corpus, q0, 10)
      .select(col("nid"), lit(0L).as("z"))).map { case (nid, _) => (0L, nid) }
    def qid0(df: DataFrame) = pairs(df.select(lit(0L).as("qid"),
      col(df.columns.head))).map { case (_, nid) => (0L, nid) }
    val y6 = qid0(SparkEntry.queries("y6_pq_ann")(spark, dir))
    val y7 = qid0(SparkEntry.queries("y7_ivfpq_ann")(spark, dir))

    // true-score lookup for every id any side touched (tiny driver set)
    val need = (exact3 ++ y5 ++ y4 ++ exactL2 ++ y6 ++ y7).map(_._2)
      .distinct ++ (0L until 20L)
    val vecs: Map[Long, Array[Double]] = corpus
      .filter(col("vec_id").isin(need: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosOf(q: Long, nid: Long): Double = {
      val (a, b) = (vecs(q), vecs(nid))
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
    }
    def d2Of(q: Long, nid: Long): Double = {
      val (a, b) = (vecs(q), vecs(nid))
      var (s, i) = (0.0, 0)
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val eps = 1e-9
    val kthCos: Map[Long, Double] = exact3.groupBy(_._1).map { case (q, s) =>
      q -> s.map(p => cosOf(q, p._2)).min }
    val kthL2: Map[Long, Double] = Map(
      0L -> exactL2.map(p => d2Of(0L, p._2)).max)
    val geC = (a: Double, t: Double) => a >= t - eps
    val leD = (a: Double, t: Double) => a <= t + eps
    if (sys.env.contains("SPARK_GRAFT_RECALL_VERBOSE")) {
      for ((nm, ap) <- Seq("y4" -> y4, "y5" -> y5)) {
        kthCos.toSeq.sortBy(_._1).foreach { case (q, t) =>
          val scored = ap.filter(_._1 == q)
            .map { case (_, nid) => (nid, cosOf(q, nid)) }
          val hits = scored.count { case (_, c) => geC(c, t) }
          if (hits < 3) println(f"[recall:$nm] qid=$q kth=$t%.6f " +
            scored.map { case (nid, c) => f"$nid:$c%.6f" }.mkString(" "))
        }
      }
      for ((nm, ap) <- Seq("y6" -> y6, "y7" -> y7)) {
        val t = kthL2(0L)
        val scored = ap.map { case (_, nid) => (nid, d2Of(0L, nid)) }
        println(f"[recall:$nm] qid=0 kthD2=$t%.6f " +
          scored.map { case (nid, d) => f"$nid:$d%.6f" }.mkString(" "))
        println(f"[recall:$nm] exactL2 " + exactL2.map { case (_, nid) =>
          f"$nid:${d2Of(0L, nid)}%.6f" }.mkString(" "))
      }
    }
    // two readings: STRICT (true score ≥ true kth, eps 1e-9) and
    // SURFACE (eps 5e-5 — half the 4-dp rounding the contract queries
    // emit, so copies that tie at the query's own output precision
    // count as hits; x10 verbose run confirmed every strict cos miss
    // is such a tie, within 1e-4 of the threshold). Cosine arms go
    // through AnnEval — the same implementation BlowupRecallSpec runs
    // in CI — so the recorded numbers and the CI guard cannot drift.
    val kthDf = AnnEval.cosineThresholds(corpus, 20, 3).cache()
    def pairDf(p: Seq[(Long, Long)]): DataFrame = {
      import spark.implicits._
      p.toDF("qid", "nid")
    }
    def cosRecall(ap: Seq[(Long, Long)], e: Double): Double =
      AnnEval.thresholdRecall(pairDf(ap), corpus, kthDf, 20, 3, e)
    println(f"[recall] x$factor%d n=$n%d strict" +
      f"  y4_lsh=${cosRecall(y4, eps)}%.3f" +
      f"  y5_ivf=${cosRecall(y5, eps)}%.3f" +
      f"  y6_pq=${recall(y6, kthL2, d2Of, leD, 10)}%.3f" +
      f"  y7_ivfpq=${recall(y7, kthL2, d2Of, leD, 10)}%.3f")
    println(f"[recall] x$factor%d n=$n%d at-4dp" +
      f"  y4_lsh=${cosRecall(y4, 5e-5)}%.3f" +
      f"  y5_ivf=${cosRecall(y5, 5e-5)}%.3f")
    // ADC arms at blow-up scale: every copy of a source quantizes to
    // the SAME PQ code (the ±2% perturbation is below sub-quantizer
    // cell width), so ADC distance ties across all factor−1 copies and
    // the returned 10 are an arbitrary (id-ordered) subset — id-set
    // recall then measures tie-ordering, not index quality (expected
    // k/copies ≈ 0.1 at x100 by construction). The tie-robust reading
    // is the distance-approximation ratio: TRUE d2 of what the index
    // returned over the exact 10th-NN d2 — ~1.0 means the returns are
    // as close as the true top-10 to within quantization resolution.
    val kth10 = kthL2(0L)
    for ((nm, ap) <- Seq("y6_pq" -> y6, "y7_ivfpq" -> y7)) {
      val ds = ap.map { case (_, nid) => d2Of(0L, nid) }
      println(f"[recall] x$factor%d $nm%s approx-ratio" +
        f" mean=${ds.sum / ds.size / kth10}%.4f max=${ds.max / kth10}%.4f")
    }
    // Resolution floor: the index cannot be asked to rank finer than
    // its own quantization error. Census the ADC tie at the query's
    // code (how many corpus vectors share ONE packed code with copy 0's
    // source — those are indistinguishable to any ADC scan) and the PQ
    // reconstruction d2 (codebook-cell width in d2 units) against the
    // exact 10th-NN d2 the strict reading demands the index resolve.
    locally {
      import graft.ml.Pq
      val model = Pq.fitCached(s"pq:$dir", corpus.select(
          transform(col("embedding"), x => x.cast("double")).as("features")),
        dims = corpus.head().getSeq[Float](1).length)
      val coded = corpus.select(col("vec_id"),
        Pq.encode(col("embedding"), model).as("code"))
      val q0code = coded.filter(col("vec_id") === 0).head().getLong(1)
      val tie = coded.filter(col("code") === q0code).count()
      // reconstruction d2 of qid0 itself: decode its code via the
      // codebooks and diff against the true vector
      val recon = {
        val v = vecs(0L)
        val ds = model.dsub
        (0 until model.m).flatMap { s =>
          val centroid =
            model.codebooks(s)(((q0code >> (s * 4)) & 0xfL).toInt)
          (0 until ds).map(j => {
            val d = v(s * ds + j) - centroid(j); d * d })
        }.sum
      }
      println(f"[recall] x$factor%d pq-resolution: code-tie=$tie%d vectors" +
        f" share qid0's code; recon_d2=$recon%.4f vs exact-10th d2=" +
        f"$kth10%.4f (ratio ${recon / kth10}%.1f)")
    }
    spark.stop()
  }
}
