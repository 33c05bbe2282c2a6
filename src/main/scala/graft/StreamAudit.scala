package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev audit for the streaming queries' cost anatomy (SCALE.md §z4;
  * re-run for VERDICT r9 ask #7 with honest forcing and the 16-shard
  * state sizing): per query, wall time split into stream START (source
  * discovery + planning + state init — paid once per query start) vs
  * batch EXECUTION, and the per-batch `durationMs` breakdown Spark
  * reports (addBatch = real work incl. sink I/O; walCommit +
  * commitOffsets = the commit protocol; queryPlanning; state-store
  * commit isolated from the stateOperators metrics). Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=16 \
  *     java -cp <cp> graft.StreamAudit [query ...]
  *
  * Default queries: the eight real micro-batch executions that carry
  * ~13 s of the 59 s bench total. Legacy z4-only mode:
  * `graft.StreamAudit --z4` (the r6 start-vs-exec table).
  */
object StreamAudit {

  private final case class B(batchId: Long, durations: Map[String, Long],
      stateCommitMs: Long, stateUpdateMs: Long, stateRows: Long,
      outRows: Long)

  /** Collects every QueryProgressEvent; the streaming listener bus is
    * async, so readers sleep briefly after awaitTermination. */
  private final class Progress extends StreamingQueryListener {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[B]
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      import scala.jdk.CollectionConverters._
      val d = p.durationMs.asScala.map { case (k, v) => k -> v.toLong }
      val ops = p.stateOperators.toSeq
      batches.add(B(p.batchId, d.toMap,
        ops.map(o => Option(o.customMetrics.get("commitTimeMs"))
          .map(_.toLong).getOrElse(0L)).sum,
        ops.map(_.allUpdatesTimeMs).sum,
        ops.map(_.numRowsTotal).sum,
        p.sink.numOutputRows))
    }
    def drainAll(): Seq[B] = {
      Thread.sleep(1000) // listener bus is async
      import scala.jdk.CollectionConverters._
      val out = batches.asScala.toSeq
      batches.clear()
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.EventStream.readEvents(spark, sfDir).count()

    if (args.headOption.contains("--z4")) { z4Legacy(spark, sfDir); return }
    if (args.headOption.contains("--horizon")) {
      horizonAudit(spark, sfDir); spark.stop(); return
    }

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("z4_stream_windowed", "z8_stream_append",
        "z9_stream_sessions", "z13_stream_join",
        "z15_stream_sessions_all", "z16_stream_session_window",
        "z18_stream_dedup", "z21_stream_funnel", "z22_stream_retention",
        "z23_stream_hll", "z24_stream_cms", "z25_stream_quantiles",
        "z26_stream_windowed_hll")
    val listener = new Progress
    spark.streams.addListener(listener)
    println("[saudit] query,pass,wall_s,batches,trigger_ms,addBatch_ms," +
      "walCommit_ms,commitOffsets_ms,planning_ms,stateCommit_ms," +
      "stateUpdate_ms,stateRows,outRows,start_overhead_ms")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[saudit] $name: UNKNOWN")
        case Some(fn) =>
          (1 to 2).foreach { pass =>
            listener.drainAll()
            val t0 = System.nanoTime()
            Force(fn(spark, sfDir))
            val wall = (System.nanoTime() - t0) / 1e9
            val bs = listener.drainAll()
            def sum(k: String) = bs.map(_.durations.getOrElse(k, 0L)).sum
            val trigger = sum("triggerExecution")
            println(f"[saudit] $name,${if (pass == 1) "cold" else "warm"}," +
              f"$wall%.2f,${bs.length},$trigger,${sum("addBatch")}," +
              f"${sum("walCommit")},${sum("commitOffsets")}," +
              f"${sum("queryPlanning")},${bs.map(_.stateCommitMs).sum}," +
              f"${bs.map(_.stateUpdateMs).sum},${bs.map(_.stateRows).sum}," +
              f"${bs.map(_.outRows).sum}," +
              f"${math.round(wall * 1000 - trigger)}")
          }
      }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }

  /** State-lifetime audit for the opt-in horizon eviction (VERDICT r14
    * ask #1): two-stage file-source replay of the funnel and retention
    * state machines — land the corpus' first half (by event time), run
    * to completion on a persistent checkpoint, land the second half,
    * run again. The second run's watermark passes the early users'
    * horizons, so their tombstones/anchors DROP; the unbounded control
    * arm keeps one state row per user ever seen. Emits
    * `state_rows` vs `users_ever` per arm — the BENCH_SCALES row.
    * Retention runs with 6-hour "weeks" so the 64-week inert point
    * (16 days) lands inside the 30-day corpus; the funnel keeps its
    * production 7-day window. Both horizons are 1 day of lateness. */
  private def horizonAudit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val es = graft.streaming.EventStream
    val dayUs = 86400L * 1000000
    val events = es.readEvents(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val cut = events.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0)(0)
    val funnelUsers = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("user_id").distinct().count()
    val allUsers = events.select("user_id").distinct().count()
    println(s"[haudit] users_ever_funnel=$funnelUsers users_ever=$allUsers")

    def stage(tmp: java.nio.file.Path, half: Int): Unit =
      (if (half == 1) events.filter(unix_micros(col("ts")) <= cut)
       else events.filter(unix_micros(col("ts")) > cut))
        .coalesce(4).write.mode("append").parquet(tmp.resolve("src").toString)

    def audit(kind: String, horizonUs: Long): Unit = {
      val tag = if (horizonUs == Long.MaxValue) "control" else "horizon_1d"
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_haudit_$tag")
      stage(tmp, 1)
      def run(n: Int): Unit = {
        val guards = es.StreamGuards(spark, s"haudit_${kind}_$tag$n")
        val src = spark.readStream.schema(events.schema)
          .parquet(tmp.resolve("src").toString)
          .withWatermark("ts", "2 hours")
        val out = kind match {
          case "funnel" => es.funnelChain(
            src.filter(col("event_type").isin("view", "click", "purchase"))
              .as[es.FunnelEvent],
            graft.operators.ExtensionOps.FunnelWindowUs, guards, horizonUs)
          case _ => es.retentionHits(
            src.as[es.FunnelEvent], 6L * 3600 * 1000000, guards, horizonUs)
        }
        // foreachBatch terminal (memory sink cannot recover from a
        // checkpoint): the audit only reads the state-store metrics,
        // so the batch body just forces the batch
        val q = out.writeStream
          .queryName(s"haudit_${kind}_$tag$n")
          .outputMode(if (kind == "funnel") "update" else "append")
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .foreachBatch((b: org.apache.spark.sql.Dataset[_], _: Long) =>
            { b.count(); () })
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val rows = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
        println(s"[haudit] $kind,$tag,run$n,state_rows=$rows," +
          s"evictions=${guards.horizonEvictions.value}," +
          s"mask_overflow=${guards.maskOverflow.value}")
      }
      run(1)
      stage(tmp, 2)
      run(2)
    }
    Seq("funnel", "retention").foreach { kind =>
      audit(kind, Long.MaxValue)
      audit(kind, dayUs)
    }
  }

  private def z4Legacy(spark: SparkSession, sfDir: String): Unit = {
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    (1 to runs).foreach { r =>
      val (startMs, execMs, batches) = graft.streaming.EventStream
        .timeWindowedOnce(spark, sfDir, queryName = s"stream_audit_$r")
      println(s"run $r: start=${startMs}ms exec=${execMs}ms " +
        s"batches=${batches.mkString("[", ",", "]")}ms " +
        s"total=${startMs + execMs}ms")
    }
  }
}
