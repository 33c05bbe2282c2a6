package graft

/** Dev probe for the DISTRIBUTED connectedComponents loop (the path
  * above the driver union-find gate, which the bench never exercises at
  * sf0.1): forces `driverMaxEdges = 0` over the x16 verified-pairs edge
  * set, prints per-round wall time, the total stage/task count of the
  * loop region (via a SparkListener), and the final labels checksum so
  * a layout change is provably label-identical. Run:
  *
  *   SPARK_GRAFT_CPUS=32 java -cp <cp> graft.CcLoopProbe /root/testdata/sf0.1
  *
  * Evidence consumer: OPTIMIZATION_r16 (VERDICT r15 ask #3 — give the
  * CC loop the pageRank checkpoint-layout treatment).
  */
object CcLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          tasks.addAndGet(sc.stageInfo.numTasks.toLong)
          stages.incrementAndGet()
        }
      })
    val edges = graft.operators.TextOps
      .cachedVerifiedPairs(spark, sfDir, k = 16, bands = 4, threshold = 0.5)
      .select("doc_a", "doc_b")
    edges.count() // build the fixture outside the probed window
    (1 to 2).foreach { pass =>
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      tasks.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val labels = graft.operators.TextOps
        .connectedComponents(edges, driverMaxEdges = 0)
      val n = Force(labels)
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      println(f"[ccprobe] pass=$pass wall=$wall%.2fs rounds=${
        graft.operators.TextOps.lastCcRounds} stages=${stages.get} " +
        f"tasks=${tasks.get} rows=$n checksum=${
          QueryTime.contentChecksum(graft.operators.TextOps
            .connectedComponents(edges, driverMaxEdges = 0))}")
    }
    // pageRank's distributed loop under the same forcing (VERDICT r15
    // ask #5 — the loop the driver gate hides from the bench; the row
    // BENCH_SCALES §r16 quotes): x33's exact geometry, 10 rounds, 0.85.
    (1 to 2).foreach { pass =>
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      tasks.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val pr = graft.operators.TextOps
        .pageRank(edges, iters = 10, damping = 0.85, driverMaxEdges = 0)
      val n = Force(pr)
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      println(f"[prprobe] pass=$pass wall=$wall%.2fs stages=${stages.get} " +
        f"tasks=${tasks.get} rows=$n checksum=${
          QueryTime.contentChecksum(graft.operators.TextOps
            .pageRank(edges, iters = 10, damping = 0.85,
              driverMaxEdges = 0))}")
    }
    spark.stop()
  }
}
