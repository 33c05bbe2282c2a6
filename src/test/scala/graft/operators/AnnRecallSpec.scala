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
      "(dominant near-dup cluster)") {
    // Adversarial fixture, the ANN twin of TextOpsSpec's 20%-identical
    // dedup corpus: 1200 vectors where 300 share one dominant direction
    // (tiny deterministic per-id jitter) — every member lands in the
    // SAME (tab, bucket) in every hash table, so the uncapped
    // within-bucket self-join would pay >= L * 300^2 = 540k pairs from
    // that bucket alone. The cap must bound candidates at n*L*cap and
    // still return cos~1 neighbors for every cluster member.
    import spark.implicits._
    val dim = SimilarityOps.EmbeddingDim
    val n = 1200
    val nDup = 300
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
    val capped = SimilarityOps.lshCandidatePairs(e, None, cap).count()
    assert(capped <= n.toLong * seeds.length * cap,
      s"candidate count $capped exceeds the n*L*cap bound")
    assert(capped < seeds.length.toLong * nDup * nDup,
      s"candidate count $capped not bounded below the uncapped " +
        "dominant-bucket volume")
    // quality survives the cap: every cluster member still finds a
    // near-identical neighbor at the top
    val top = SimilarityOps.lshTopK(emb, k = 1, dims = dim,
      capPerBucket = cap)
      .filter(col("qid") < nDup).cache()
    assert(top.count() == nDup, "a capped query lost cluster members")
    val minTop = top.agg(min("cos_sim")).head().getDouble(0)
    assert(minTop >= 0.99,
      f"top-1 cosine $minTop%.4f for a near-dup member — cap broke recall")
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
