package graft.operators

import graft.{SparkSpec, Tables => T}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Task-retry determinism: a 100 TB cluster re-executes failed tasks
  * constantly (preemption, spot loss, fetch failures), so a query's
  * result must be identical whether or not any task ran twice. The
  * engine's determinism story to date was cross-boot (same JVM count,
  * no failures); these specs kill the first attempt of partition 0
  * mid-stage and assert the results byte-match a clean run — one codec
  * query (z11's image round trip: partition-local imperative decode)
  * and one shuffle query (x26's semantic components: bucket join +
  * iterative min-label propagation).
  *
  * Relies on the shared session's `local[4, 2]` master (maxFailures=2,
  * the retry-capable configuration a cluster always has; plain
  * local[n] would turn the injected failure fatal).
  */
class RetryDeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Wrap `df` so the FIRST attempt of partition 0 of any stage
    * computing it dies before emitting a row; retries pass through.
    * Round-trips through the RDD API on purpose — the failure must be
    * a real task failure inside a stage, not a planning-time error. */
  private def failFirstAttempt(df: DataFrame, marker: String): DataFrame = {
    val schema = df.schema
    val rdd = df.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException(
          s"injected one-shot task failure [$marker]")
      it
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  it("z11 image round trip is identical after a mid-stage task retry") {
    val docs = T.documents(spark, sf).select("doc_id")
    val clean = collectSorted(graft.multimodal.Multimodal.imageRoundTrip(docs))
    val retried = collectSorted(graft.multimodal.Multimodal.imageRoundTrip(
      failFirstAttempt(docs, "z11")))
    assert(retried.nonEmpty, "retry run returned no rows")
    assert(retried === clean,
      "image round trip diverged after a task retry")
  }

  it("x26 semantic components are identical after a mid-stage task retry") {
    val emb = SimilarityOps.checkedEmbeddings(spark, sf)
    val nBits = SimilarityOps.scaledLshBits(emb.count())
    def components(e0: DataFrame): Seq[String] = {
      val e = SimilarityOps.bucketedFrame(e0, nBits, Seq(42L),
        SimilarityOps.EmbeddingDim)
        .select(col("vec_id"), col("embedding"), col("bucket"))
      collectSorted(
        TextOps.connectedComponents(TextOps.semanticPairs(e, 0.25)))
    }
    val clean = components(emb)
    val retried = components(failFirstAttempt(emb, "x26"))
    assert(retried.nonEmpty, "retry run returned no rows")
    assert(retried === clean,
      "semantic components diverged after a task retry")
  }

  it("x33 pagerank is identical after a mid-stage task retry") {
    // the iterative case: a retry inside any of the ten eager
    // localCheckpoint rounds must reproduce the same materialized
    // frame, or rank drift compounds across the remaining iterations
    def ranks(inject: Boolean): Seq[String] = {
      val edges = TextOps.cachedVerifiedPairs(spark, sf,
        k = 16, bands = 4, threshold = 0.5).select("doc_a", "doc_b")
      val e = if (inject) failFirstAttempt(edges, "x33") else edges
      // force the distributed loop — the retry-inside-a-round hazard
      // this spec pins does not exist on the driver fast path
      collectSorted(
        TextOps.pageRank(e, iters = 10, damping = 0.85, driverMaxEdges = 0))
    }
    val clean = ranks(inject = false)
    val retried = ranks(inject = true)
    assert(retried.nonEmpty, "retry run returned no rows")
    assert(retried === clean,
      "pagerank diverged after a task retry")
  }

  it("the injection harness actually kills and retries a task") {
    // guard against the spec silently testing nothing (e.g. a future
    // session config change making attemptNumber always nonzero).
    // Accumulator updates from failed attempts are discarded, so count
    // attempts in a JVM-static — valid observable because local-mode
    // executors share the test JVM.
    RetryDeterminismSpec.p0Attempts.set(0)
    val docs = T.documents(spark, sf).select("doc_id")
    val rdd = docs.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0) {
        RetryDeterminismSpec.p0Attempts.incrementAndGet()
        if (tc.attemptNumber() == 0)
          throw new RuntimeException("injected probe failure")
      }
      it
    }
    val n = docs.sparkSession.createDataFrame(rdd, docs.schema).count()
    assert(n > 0)
    val attempts = RetryDeterminismSpec.p0Attempts.get()
    assert(attempts >= 2,
      s"partition 0 ran $attempts attempt(s) — the injection did not " +
        "kill-and-retry, so the determinism specs above proved nothing")
  }
}

object RetryDeterminismSpec {
  val p0Attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}
