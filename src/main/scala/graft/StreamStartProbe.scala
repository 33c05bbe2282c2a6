package graft

import org.apache.spark.sql.functions._

/** Dev probe for VERDICT r15 ask #4: split z25/z26 wall time into the
  * STREAM segment (runner call: query start + micro-batches + sink
  * read-back) vs the BATCH segment (sketch finish + exact control arm +
  * join + contract sort), with the trigger total from the progress
  * listener so stream start = stream_segment − trigger. Mirrors the
  * QueryDef pipelines verbatim (probe-only duplication — the contract
  * queries stay single-source in ExtensionOps). Run:
  *
  *   SPARK_GRAFT_CPUS=32 java -cp <cp> graft.StreamStartProbe /root/testdata/sf0.1
  */
object StreamStartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val es = graft.streaming.EventStream
    val tx = graft.operators.TextOps
    es.readEvents(spark, sfDir).count()
    val trigger = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryProgressEvent): Unit =
          trigger.addAndGet(Option(e.progress.durationMs
            .get("triggerExecution")).map(_.toLong).getOrElse(0L))
      })
    def seg[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    (1 to 3).foreach { pass =>
      // ---- z25 ----
      trigger.set(0)
      val (emitted25, s25) = seg {
        val e = es.runUpdateAggOnce(spark,
          graft.operators.ExtensionOps.quantBinCounts(
            es.eventsStream(spark, sfDir)),
          queryName = s"probe_quant_$pass")
        e.count(); e // force the sink read inside the stream segment
      }
      Thread.sleep(300) // listener bus is async
      val t25 = trigger.get()
      val (_, b25) = seg {
        val sketch = emitted25.groupBy("event_type", "bin")
          .agg(max("cnt").as("cnt"))
        val ps = Seq("50" -> 0.5, "90" -> 0.9, "99" -> 0.99)
        val est = tx.histQuantileBins(sketch, "event_type", ps)
        val exact = tx.exactOrderStats(
          es.readEvents(spark, sfDir)
            .select(col("event_type"), col("value").as("v")),
          "event_type", ps)
        Force(est.join(exact, Seq("event_type")).orderBy("event_type"))
      }
      println(f"[ssprobe] z25 pass=$pass stream=$s25%.2fs " +
        f"(trigger=${t25 / 1000.0}%.2fs start=${s25 - t25 / 1000.0}%.2fs) " +
        f"batch_arms=$b25%.2fs")
      // ---- z26 ----
      trigger.set(0)
      val (emitted26, s26) = seg {
        val regs = tx.hllBktRho(
          es.eventsStream(spark, sfDir)
            .withWatermark("ts", "2 hours")
            .select(col("ts"), col("event_type"),
              graft.functions.PolyHash64
                .polyhash64(col("user_id").cast("string")).as("h")),
          "ts", "event_type")
          .groupBy(window(col("ts"), "1 hour").as("w"),
            col("event_type"), col("bkt"))
          .agg(max("rho").as("rmax"))
        val e = es.runAppendAggOnce(spark, regs,
          queryName = s"probe_whll_$pass")
        e.count(); e
      }
      Thread.sleep(300)
      val t26 = trigger.get()
      val (_, b26) = seg {
        val est = tx.hllEstimate(
          emitted26.select(unix_micros(col("w.start")).as("ws"),
            col("event_type"), col("bkt"), col("rmax")),
          "ws", "event_type")
        val exact = es.readEvents(spark, sfDir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(countDistinct("user_id").as("n_exact"))
          .select(unix_micros(col("w.start")).as("ws"), col("event_type"),
            col("n_exact"))
        Force(exact.join(est, Seq("ws", "event_type"))
          .orderBy("ws", "event_type"))
      }
      println(f"[ssprobe] z26 pass=$pass stream=$s26%.2fs " +
        f"(trigger=${t26 / 1000.0}%.2fs start=${s26 - t26 / 1000.0}%.2fs) " +
        f"batch_arms=$b26%.2fs")
    }
    spark.stop()
  }
}
