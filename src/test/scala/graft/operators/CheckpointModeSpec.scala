package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reliable-checkpoint mode for the iterative loops (VERDICT r13 ask
  * #4): `spark.graft.checkpoint.dir` flips the per-round lineage
  * truncation in connectedComponents / pageRank from executor-local
  * `localCheckpoint` (blocks die with an executor) to durable
  * `checkpoint()` (survives executor loss on a real cluster). Pure
  * infrastructure — these specs pin that the RESULTS are bit-identical
  * in both modes and that the reliable mode really writes the round
  * frames to the configured directory. */
class CheckpointModeSpec extends SparkSpec {

  private val key = TextOps.ReliableCheckpointKey

  private def edges = {
    // a deterministic multi-component graph with chains (so the
    // pointer-jump loop runs >1 round) and a shared-min component
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // chain
      (10L, 11L), (11L, 12L), // second component
      (20L, 21L), // pair
      (30L, 31L), (31L, 32L), (30L, 32L)) // triangle
    spark.createDataFrame(pairs).toDF("doc_a", "doc_b")
  }

  private def withReliable[A](dir: String)(body: => A): A = {
    spark.conf.set(key, dir)
    try body finally spark.conf.unset(key)
  }

  it("connectedComponents: reliable mode matches local mode exactly " +
      "and writes round frames to the configured dir") {
    // driverMaxEdges = 0 forces the DISTRIBUTED pointer-jump loop —
    // the driver union-find fast path never touches a checkpoint
    val local = TextOps.connectedComponents(edges, driverMaxEdges = 0)
      .collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cc")
    val reliable = withReliable(dir.toString) {
      TextOps.connectedComponents(edges, driverMaxEdges = 0)
        .collect().toSet
    }
    assert(reliable == local,
      s"modes diverged: ${reliable.diff(local)} / ${local.diff(reliable)}")
    // the flag must have actually moved the truncation points: the
    // checkpoint tree holds at least one written RDD directory
    val wrote = java.nio.file.Files.walk(dir)
      .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
    assert(wrote > 0, s"no rdd-* checkpoint dirs written under $dir")
  }

  it("pageRank: reliable mode matches local mode exactly") {
    val local = TextOps.pageRank(edges, iters = 5, damping = 0.85, driverMaxEdges = 0)
      .collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-pr")
    val reliable = withReliable(dir.toString) {
      TextOps.pageRank(edges, iters = 5, damping = 0.85, driverMaxEdges = 0).collect().toSeq
    }
    assert(reliable == local)
    val wrote = java.nio.file.Files.walk(dir)
      .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
    assert(wrote > 0, s"no rdd-* checkpoint dirs written under $dir")
  }

  it("checkpoint interval: results identical, strictly fewer durable " +
      "frames written (VERDICT r14 ask #6 amortization)") {
    val intervalKey = TextOps.CheckpointIntervalKey
    def rddDirs(dir: java.nio.file.Path): Long =
      java.nio.file.Files.walk(dir)
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
    // arm A: cut every round (interval default 1)
    val d1 = java.nio.file.Files.createTempDirectory("graft-ckpt-i1")
    val every = withReliable(d1.toString) {
      (TextOps.connectedComponents(edges, driverMaxEdges = 0)
        .collect().toSet,
        TextOps.pageRank(edges, iters = 5, damping = 0.85, driverMaxEdges = 0).collect().toSeq)
    }
    // arm B: durable cut every 3rd round — carried rounds keep lineage
    val d3 = java.nio.file.Files.createTempDirectory("graft-ckpt-i3")
    spark.conf.set(intervalKey, "3")
    val spaced = try withReliable(d3.toString) {
      (TextOps.connectedComponents(edges, driverMaxEdges = 0)
        .collect().toSet,
        TextOps.pageRank(edges, iters = 5, damping = 0.85, driverMaxEdges = 0).collect().toSeq)
    } finally spark.conf.unset(intervalKey)
    assert(spaced == every, "interval mode changed results")
    // the local (no-checkpoint-dir) baseline agrees too
    val local = (TextOps.connectedComponents(edges, driverMaxEdges = 0)
      .collect().toSet,
      TextOps.pageRank(edges, iters = 5, damping = 0.85, driverMaxEdges = 0).collect().toSeq)
    assert(spaced == local)
    val (w1, w3) = (rddDirs(d1), rddDirs(d3))
    assert(w3 < w1,
      s"interval 3 must write fewer durable frames: $w3 vs $w1")
    // anchor frames (edge lists, degree, seeds) still cut every time —
    // only the per-round loop frames follow the schedule
    assert(w3 > 0)
  }

  it("a malformed checkpoint interval fails loudly, naming the key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-bad")
    spark.conf.set(TextOps.CheckpointIntervalKey, "2s")
    val e = try intercept[IllegalArgumentException] {
      withReliable(dir.toString) {
        TextOps.pageRank(edges, iters = 2, damping = 0.85, driverMaxEdges = 0).collect()
      }
    } finally spark.conf.unset(TextOps.CheckpointIntervalKey)
    assert(e.getMessage.contains(TextOps.CheckpointIntervalKey) &&
      e.getMessage.contains("2s"),
      s"error must name the bad conf: ${e.getMessage}")
  }

  it("rounds share one checkpoint root: setCheckpointDir is not " +
      "re-derived per truncate call") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-one")
    withReliable(dir.toString) {
      TextOps.pageRank(edges, iters = 3, damping = 0.85, driverMaxEdges = 0).collect()
    }
    // setCheckpointDir creates ONE uuid subdir; every round's rdd-*
    // must land inside it (a fresh subdir per round would mean the
    // qualified-path guard in truncate() regressed)
    val roots = java.nio.file.Files.list(dir).count()
    assert(roots == 1, s"expected 1 checkpoint root under $dir, got $roots")
  }
}
