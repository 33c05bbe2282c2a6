package graft

import org.apache.spark.sql.SparkSession

/** Dev driver: time individual contract queries in isolation.
  *
  *   sbt "runMain graft.QueryTime /root/testdata/sf0.1 x15_top_bigrams y4_lsh_ann"
  *
  * Each query runs twice (cold, warm) after an untimed table warmup, so
  * per-query cost separates from session/file-index init. Complements
  * Bench (whole-suite, driver contract) and PlanAudit (plan shapes).
  *
  * `SPARK_GRAFT_STAGE_METRICS=1` additionally prints, per completed
  * stage of the WARM pass, the metrics that diagnose where a blow-up
  * decade's time goes: shuffle read/write bytes, memory/disk spill, and
  * executor run time — the evidence behind "spill-bound" claims in
  * BENCH_SCALES.md (aggregated in-process via a SparkListener, no event
  * log or UI needed).
  */
object QueryTime {

  private final class StageMetrics extends org.apache.spark.scheduler.SparkListener {
    case class Row(id: Int, name: String, tasks: Int, runMs: Long,
      shufRead: Long, shufWrite: Long, memSpill: Long, diskSpill: Long,
      input: Long)
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    @volatile var enabled = false
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val m = i.taskMetrics
      val r = Row(i.stageId, i.name.takeWhile(_ != '\n').take(60),
        i.numTasks, m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten,
        m.memoryBytesSpilled, m.diskBytesSpilled, m.inputMetrics.bytesRead)
      // stream every completion (both passes) so a crashed run still
      // shows which stage the bytes went to; the end-of-query report
      // below aggregates the warm pass only
      val gb = 1024.0 * 1024 * 1024
      println(f"[qlive] ${r.id}%4d tasks=${r.tasks}%3d " +
        f"run=${r.runMs / 1000.0}%7.1fs in=${r.input / gb}%6.2fG " +
        f"sr=${r.shufRead / gb}%6.2fG sw=${r.shufWrite / gb}%6.2fG " +
        f"spill=${r.memSpill / gb}%6.2fG/${r.diskSpill / gb}%6.2fG " +
        r.name)
      if (enabled) rows += r
    }
    def report(query: String): Unit = {
      val gb = 1024.0 * 1024 * 1024
      rows.sortBy(-_.runMs).take(12).foreach { r =>
        println(f"[qstage] $query ${r.id}%4d ${r.name}%-60s " +
          f"tasks=${r.tasks}%3d run=${r.runMs / 1000.0}%7.1fs " +
          f"in=${r.input / gb}%6.2fG sr=${r.shufRead / gb}%6.2fG " +
          f"sw=${r.shufWrite / gb}%6.2fG " +
          f"spillMem=${r.memSpill / gb}%6.2fG spillDisk=${r.diskSpill / gb}%6.2fG")
      }
      val t = rows
      println(f"[qstage] $query TOTAL stages=${t.size} " +
        f"run=${t.map(_.runMs).sum / 1000.0}%.1fs " +
        f"sr=${t.map(_.shufRead).sum / gb}%.2fG " +
        f"sw=${t.map(_.shufWrite).sum / gb}%.2fG " +
        f"spillMem=${t.map(_.memSpill).sum / gb}%.2fG " +
        f"spillDisk=${t.map(_.diskSpill).sum / gb}%.2fG")
      rows.clear()
    }
  }

  /** Order-insensitive content checksum of a full result: three
    * independent folds over the per-row xxhash64 multiset — bit-xor,
    * wrapping sum (decimal(38,0): exact to ~1e19 rows, no ANSI
    * overflow), and exact count. All three are partitioning- and
    * order-independent; xor alone is blind to even-multiplicity
    * differences (a dropped/doubled duplicate PAIR cancels out of the
    * xor), the sum+count close that hole (ADVICE r10,
    * `ChecksumSpec`). Lets a separate-JVM run be asserted
    * bit-identical to a fused run at scales the DuckDB oracle can't
    * reach. Returns "EMPTY" for zero-row results. */
  def contentChecksum(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.functions._
    val h = df
      .select(xxhash64(scala.collection.immutable.ArraySeq
        .unsafeWrapArray(df.columns.map(col)): _*).as("h"))
      .agg(expr("bit_xor(h)"), expr("sum(cast(h AS DECIMAL(38,0)))"),
        count(lit(1)))
      .head()
    if (h.isNullAt(0)) "EMPTY"
    else s"${h.getLong(0).toHexString}/${h.getDecimal(1)}/${h.getLong(2)}"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = if (sys.env.get("SPARK_GRAFT_STAGE_METRICS").contains("1")) {
      val l = new StageMetrics
      spark.sparkContext.addSparkListener(l)
      Some(l)
    } else None
    Seq("lineitem", "documents", "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    // VERDICT r9 ask #6: the stateful streaming queries get their state
    // -store provider from the MEASURED sizing rule, not a static pick —
    // live keys estimated once from the event table, deployment = this
    // probe JVM (1 executor, its max heap). At anchor/×10 volumes the
    // rule keeps Spark's in-heap default; a ×1000 blow-up on a 24 g heap
    // crosses the 300 k keys/GiB envelope and flips to RocksDB.
    val statefulZ = Set("z4_stream_windowed", "z8_stream_append",
      "z9_stream_sessions", "z10_session_window", "z13_stream_join",
      "z15_stream_sessions_all", "z16_stream_session_window",
      "z18_stream_dedup", "z21_stream_funnel", "z22_stream_retention")
    lazy val providerByRule: String = {
      val liveKeys = graft.streaming.EventStream
        .liveKeyEstimate(spark, sfDir)
      // deployment = what this session actually runs on: under a
      // separate-JVM master the executor list (minus the driver entry)
      // and spark.executor.memory; in local mode one JVM at its max heap
      val infos = spark.sparkContext.statusTracker.getExecutorInfos
      val separate = infos.length > 1
      val executors = if (separate) infos.length - 1 else 1
      val heapGiB =
        if (separate)
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.executor.memory", "1g")) /
            (1024.0 * 1024 * 1024)
        else Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
      val p = graft.streaming.StateStores
        .configure(spark, liveKeys, executors, heapGiB)
      println(f"[qtime] state-store rule: liveKeys=$liveKeys " +
        f"executors=$executors heapGiB=$heapGiB%.1f -> $p")
      p
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[qtime] $name: UNKNOWN")
        case Some(fn) =>
          if (statefulZ(name)) providerByRule // first stateful query applies it
          val times = (1 to 2).map { pass =>
            // stage metrics cover the WARM pass only (pass 2): the cold
            // pass builds pay-once fixtures whose stages would swamp the
            // steady-state picture. Drain the async listener bus BEFORE
            // flipping enabled, or late cold-pass stage-completed events
            // (thousands of tasks under the blow-up runs this profiles)
            // get attributed to the warm report.
            metrics.foreach { l =>
              org.apache.spark.graftbridge.ListenerBridge
                .drain(spark.sparkContext)
              l.enabled = pass == 2; l.rows.clear()
            }
            val t0 = System.nanoTime()
            val n = Force(fn(spark, sfDir))
            ((System.nanoTime() - t0) / 1e9, n)
          }
          println(f"[qtime] $name%-22s cold=${times(0)._1}%6.2fs " +
            f"warm=${times(1)._1}%6.2fs rows=${times(1)._2}")
          // SPARK_GRAFT_CHECKSUM=1: see contentChecksum's scaladoc.
          // Determinism of the queries themselves is
          // RetryDeterminismSpec's contract.
          if (sys.env.get("SPARK_GRAFT_CHECKSUM").contains("1"))
            println(s"[qhash] $name ${
              QueryTime.contentChecksum(fn(spark, sfDir))}")
          // listener events are posted asynchronously; drain before report
          metrics.foreach { l =>
            org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
            l.report(name)
            l.enabled = false
          }
      }
    }
    spark.stop()
  }
}
