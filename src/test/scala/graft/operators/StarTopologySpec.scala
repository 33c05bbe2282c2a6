package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the star-edge over-cap topology (VERDICT r9 ask #3): over-cap
  * buckets emit hub STARS (diameter 2), so the distributed component
  * loop converges in a constant number of pointer-jumping rounds at ANY
  * copy factor — where the r9 rank chain made the dominant cluster one
  * long PATH and the loop O(log m) rounds (the suite's only SUPER
  * growth flag, x26 ×10→×100 at 15.3×).
  *
  * Fixture: the 1000-copy dominant embedding cluster (the AnnRecallSpec
  * shape) — 1000 of 1300 vectors share one direction with tiny jitter,
  * land in ONE sign bucket at any nBits, and blow the 256 cap 4×. The
  * driver fast path is disabled so the spec exercises the distributed
  * min-label + pointer-jumping loop a 100 TB corpus would run. */
class StarTopologySpec extends SparkSpec {

  it("1000-copy over-cap bucket: components match all-pairs and the " +
      "distributed loop converges in <= 3 rounds") {
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
    val e = SimilarityOps
      .bucketedFrame(emb, SimilarityOps.scaledLshBits(n), Seq(42L), dim)
      .cache()
    val biggest = e.groupBy("bucket").count().agg(max("count"))
      .head().getLong(0)
    assert(biggest >= nDup,
      s"fixture failed to produce a dominant bucket (max=$biggest)")

    val starred = TextOps.semanticPairs(e, 0.25, maxBucket = 256)
    // star volume: the dominant bucket contributes m-1 spokes, not m²/2
    val nPairs = starred.count()
    assert(nPairs < nDup.toLong * nDup / 8,
      s"over-cap bucket still quadratic: $nPairs pairs")

    // distributed path forced (driverMaxEdges=0): labels must equal the
    // uncapped all-pairs labels on the hazard population, and the loop
    // must converge in <= 3 rounds (seed round gives every spoke its
    // hub label; one propagation round confirms; headroom of one more
    // for organic-bucket stragglers)
    val capped = TextOps.connectedComponents(starred, driverMaxEdges = 0L)
      .filter(col("doc_id") < nDup)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cappedRounds = TextOps.lastCcRounds
    assert(cappedRounds >= 1 && cappedRounds <= 3,
      s"star topology should converge in <= 3 rounds, took $cappedRounds")
    val uncapped = TextOps.connectedComponents(
        TextOps.semanticPairs(e, 0.25, maxBucket = Int.MaxValue),
        driverMaxEdges = 0L)
      .filter(col("doc_id") < nDup)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == uncapped,
      "star labels differ from all-pairs labels on the hazard population")
    assert(capped.values.toSet == Set(0L),
      "cluster did not resolve to one component labeled by its minimum")
    emb.unpersist(); e.unpersist()
  }
}
