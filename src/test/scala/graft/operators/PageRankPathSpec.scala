package graft.operators

import graft.SparkSpec

/** r15 optimization: pageRank gained the same dual-gated driver fast
  * path connectedComponents carries (a local power iteration replaces
  * `iters` eager checkpoint rounds of job-scheduling latency when the
  * edge list fits the driver budget). These specs pin that the fast
  * path and the distributed loop produce IDENTICAL ranks — the 6 dp
  * per-iteration rounding absorbs summation-order tails by the query's
  * own design, and the driver applies the exact BigDecimal(HALF_UP)
  * kernel Spark's round() uses, so equality is bitwise, not tolerant.
  */
class PageRankPathSpec extends SparkSpec {

  private def ranks(edges: org.apache.spark.sql.DataFrame,
      maxEdges: Long): Map[Long, Double] =
    TextOps.pageRank(edges, iters = 10, damping = 0.85,
        driverMaxEdges = maxEdges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  it("driver and distributed paths produce bit-identical ranks") {
    import spark.implicits._
    val fixtures = Seq(
      // chain + ring + pair: asymmetric degrees, multiple components
      Seq((2L, 1L), (2L, 3L), (10L, 11L),
        (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L),
        (25L, 26L), (26L, 20L)).toDF("doc_a", "doc_b"),
      // the REAL x33 edge set (the near-dup graph of the test corpus)
      TextOps.cachedVerifiedPairs(spark, "/root/testdata/sf0.001",
        k = 16, bands = 4, threshold = 0.5).select("doc_a", "doc_b"))
    fixtures.foreach { edges =>
      val viaDriver = ranks(edges, Long.MaxValue)
      val viaLoop = ranks(edges, 0L)
      assert(viaDriver.keySet == viaLoop.keySet)
      viaDriver.foreach { case (u, r) =>
        assert(r == viaLoop(u), s"node $u: driver $r vs loop ${viaLoop(u)}")
      }
      assert(viaDriver.nonEmpty)
    }
  }

  it("ranks sum to ~1 per component set and respect degree ordering " +
      "on the chain") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = ranks(chain, Long.MaxValue)
    // center node 2 has degree 2 and receives from both leaves
    assert(r(2L) > r(1L) && r(2L) > r(3L))
    assert(math.abs(r.values.sum - 1.0) < 1e-3)
  }
}
