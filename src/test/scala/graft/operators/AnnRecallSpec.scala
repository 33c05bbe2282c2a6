package graft.operators

import graft.{SparkSpec, SparkEntry, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall evidence for the approximate-neighbor paths (no SQL oracle
  * exists for seeded-hash LSH / Spark-ML KMeans, so quality is gated
  * here instead): top-3 recall against the exact brute-force answer on
  * the sf0.001 embeddings (500 × 64, near-orthogonal synthetic vectors
  * — a deliberately hard instance for angle-based hashing).
  */
class AnnRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** exact top-k per query by cosine (brute force). */
  private def exactTopK(k: Int): DataFrame = {
    val e = T.embeddings(spark, sf)
    val a = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val b = e.select(col("vec_id").as("nid"), col("embedding"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    a.crossJoin(b)
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(SimilarityOps.fastCosine(col("qe"), col("embedding")), 4)
          .as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "nid")
  }

  private def recallOf(approx: DataFrame, exact: DataFrame): Double = {
    val hits = approx.select("qid", "nid")
      .join(exact, Seq("qid", "nid"), "left_semi").count().toDouble
    hits / exact.count()
  }

  it("multi-table LSH (y4) beats a single table and clears the floor") {
    val exact = exactTopK(3).cache()
    val multi = SimilarityOps.lshTopK(T.embeddings(spark, sf), k = 3)
    val single = SimilarityOps.lshTopK(T.embeddings(spark, sf), k = 3,
      seeds = Seq(42L))
    val rMulti = recallOf(multi, exact)
    val rSingle = recallOf(single, exact)
    info(f"y4 recall: multi-table=$rMulti%.3f single-table=$rSingle%.3f")
    // candidate union is a superset of any single table's → monotone
    assert(rMulti >= rSingle,
      f"multi-table recall $rMulti%.3f < single-table $rSingle%.3f")
    // measured 0.573 at L=6 (0.438 at the round-3 L=4, 0.695 at L=8;
    // 0.131 single — deterministic seeds, first four unchanged so the
    // candidate set is a superset of the gated round-3 configuration)
    assert(rMulti >= 0.50,
      f"multi-table recall $rMulti%.3f below floor on near-orthogonal data")
    exact.unpersist()
  }

  it("IVF with sqrt(n) cells and 2 probes (y5) clears the recall floor") {
    val exact = exactTopK(3).filter(col("qid") < 20).cache()
    val approx = SparkEntry.queries("y5_ivf_ann")(spark, sf)
    val r = recallOf(approx, exact)
    info(f"y5 recall (20 queries): $r%.3f")
    // measured 0.517 (deterministic seed)
    assert(r >= 0.30, f"IVF recall $r%.3f below floor")
    exact.unpersist()
  }

  it("bounds candidate work on a boilerplate-skewed corpus " +
      "(1000-copy dominant near-dup cluster)") {
    // Adversarial fixture, the ANN twin of TextOpsSpec's 20%-identical
    // dedup corpus, sized to the ×1000 blow-up's failure mode: 1300
    // vectors where 1000 share one dominant direction (tiny
    // deterministic per-id jitter) — every member lands in the SAME
    // (tab, bucket) in every hash table. Uncapped, that bucket alone
    // pays >= L * 1000^2 = 6M pairs; the r8 neighbor-side truncation
    // still paid m*cap per table at saturation (the x1000 probe's
    // 2.78 B-pair wall). The chain degrade must bound the over-cap
    // bucket at m*2*chainK per table and still return cos~1 neighbors
    // for every cluster member.
    import spark.implicits._
    val dim = SimilarityOps.EmbeddingDim
    val n = 1300
    val nDup = 1000
    def jitter(id: Long, i: Int): Float =
      (((id * 31 + i * 7) % 97) / 97000.0).toFloat
    val rows = (0L until n.toLong).map { id =>
      val e =
        if (id < nDup) Array.tabulate(dim)(i =>
          (if (i == 0) 1.0f else 0.0f) + jitter(id, i))
        else Array.tabulate(dim)(i =>
          (((id * 104729 + i * 7919) % 2001) / 1000.0 - 1.0).toFloat)
      (id, e)
    }
    val emb = rows.toDF("vec_id", "embedding").cache()
    val nBits = SimilarityOps.scaledLshBits(n)
    val seeds = SimilarityOps.defaultSeeds
    val e = SimilarityOps.bucketedFrame(emb, nBits, seeds, dim).cache()
    // the skew is real: some (tab, bucket) holds the whole cluster
    val maxBucket = e.groupBy("tab", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket >= nDup,
      s"fixture failed to produce a dominant bucket (max=$maxBucket)")
    val cap = 64
    val chainK = 8
    val pairs = SimilarityOps.lshCandidatePairs(e, None, cap, chainK)
      .cache()
    val capped = pairs.count()
    // exact decomposed bound: all-pairs inside exact buckets, chain
    // volume inside over-cap buckets
    val bound = e.groupBy("tab", "bucket").count()
      .select(sum(when(col("count") > cap, col("count") * (2L * chainK))
        .otherwise(col("count") * (col("count") - 1)))).head().getLong(0)
    assert(capped <= bound,
      s"candidate count $capped exceeds the decomposed bound $bound")
    // headline: the dominant cluster's own candidate volume is
    // m*L*2*chainK-shaped — linear in m with a chain-width constant —
    // where the r8 truncation paid m*L*cap at saturation (16x more at
    // cap=256/chainK=8; the x1000 probe's 2.78 B-pair wall)
    val clusterPairs = pairs
      .filter(col("qid") < nDup && col("nid") < nDup).count()
    assert(clusterPairs <= nDup.toLong * seeds.length * 2 * chainK,
      s"dominant-cluster candidates $clusterPairs exceed m*L*2*chainK")
    assert(clusterPairs < seeds.length.toLong * nDup * cap / 2,
      s"dominant-cluster candidates $clusterPairs not clearly below the " +
        "r8 cap-saturation volume — the chain degrade is not engaging")
    // the SCORED path (vectors co-located in buckets / window leads)
    // must process exactly the multiset the slim generator counts —
    // this pins lshTopK's inlined arms to lshCandidatePairs
    val scored = SimilarityOps.lshScoredCandidates(e, None, cap, chainK)
      .count()
    assert(scored === capped,
      s"scored-candidate multiset $scored != slim-pair multiset $capped")
    pairs.unpersist()
    // quality survives the chains: every cluster member still finds a
    // near-identical neighbor at the top
    val top = SimilarityOps.lshTopK(emb, k = 1, dims = dim,
      capPerBucket = cap, chainK = chainK)
      .filter(col("qid") < nDup).cache()
    assert(top.count() == nDup, "a chained query lost cluster members")
    val minTop = top.agg(min("cos_sim")).head().getDouble(0)
    assert(minTop >= 0.99,
      f"top-1 cosine $minTop%.4f for a near-dup member — chains broke recall")
    top.unpersist(); e.unpersist(); emb.unpersist()
  }

  it("checkedEmbeddings fails LOUDLY on a width != EmbeddingDim corpus") {
    // the literal-replay oracles are generated at EmbeddingDim; a
    // regenerated corpus at another width must error, not silently
    // hash-mismatch a dozen queries (cf. the r7 ts regeneration)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    Seq((0L, Array(1f, 2f, 3f), 0), (1L, Array(4f, 5f, 6f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.checkedEmbeddings(spark, dir)
    }
    assert(e.getMessage.contains("3-dim") &&
      e.getMessage.contains(SimilarityOps.EmbeddingDim.toString))
    // and the real corpus passes the probe
    assert(SimilarityOps.checkedEmbeddings(spark, sf).count() > 0)
  }
}
