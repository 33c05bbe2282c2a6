package graft.extensions

import graft.SparkSpec
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Contract-breach detection for the stateful streaming operators
  * (VERDICT r13 ask #2 / ADVICE r13): the funnel/retention state
  * machines are exact only under per-user in-order delivery across
  * micro-batches, and the counters added this round make a breach
  * OBSERVABLE. These specs drive multi-batch MemoryStream sources that
  * deliberately violate the contract and pin (a) the counter fires,
  * (b) the output diverges from the batch twin by EXACTLY the
  * documented trade (the late event is dropped, never half-merged),
  * and (c) a finalized (tombstoned) funnel chain can never re-anchor —
  * the ADVICE r13 eviction/re-entry bug. Watermark delays are chosen
  * so the late rows stay ABOVE the watermark: Spark's own late-row
  * filter silently drops sub-watermark rows before the state machine
  * runs, so the in-horizon out-of-order arrival is precisely the case
  * only these counters can see. */
class StreamGuardsSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def fe(u: Long, ms: Long, tpe: String) =
    EventStream.FunnelEvent(u, ts(ms), tpe)

  describe("funnel anchor-violation counter (z21 contract breach)") {

    it("counts a cross-batch late view and keeps the streamed anchor — " +
        "divergence from batch is exactly the documented drop") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.FunnelEvent]
      val guards = EventStream.StreamGuards(spark, "t_guard_funnel")
      val winUs = 7L * 86400 * 1000000
      // 1 h watermark delay: at a max event time of 11 s the watermark
      // stays at 0, so the 5 s late view is admitted (above-watermark
      // but below-anchor — the one case Spark's own filter cannot see)
      val q = EventStream.funnelChain(
          mem.toDS().withWatermark("ts", "1 hour"), winUs, guards)
        .writeStream.format("memory").queryName("t_guard_funnel")
        .outputMode("update").start()
      try {
        mem.addData(fe(1, 10000, "view"), fe(1, 11000, "click"))
        q.processAllAvailable()
        assert(guards.anchorViolations.value == 0)
        mem.addData(fe(1, 5000, "view")) // would retract the anchor
        q.processAllAvailable()
        assert(guards.anchorViolations.value == 1,
          s"late view must be counted, got ${guards.anchorViolations.value}")
        assert(guards.outOfOrder.value >= 1,
          "the late view is by definition out-of-order")
        // streamed triple keeps the ORIGINAL anchor (10 s); the batch
        // twin over the same three events would anchor at 5 s — the
        // divergence is exactly the dropped late view, nothing merged
        val t1s = spark.table("t_guard_funnel")
          .filter(col("user_id") === 1).agg(max("t1")).head.getLong(0)
        assert(t1s == 10000L * 1000,
          s"stream must keep the first-delivered anchor, got $t1s")
        val batchT1 = Seq(10000L, 11000L, 5000L).min * 1000
        assert(t1s != batchT1, "spec must exercise a real divergence")
      } finally q.stop()
    }

    it("keeps a finalized chain as a tombstone: a returning user cannot " +
        "re-anchor, and post-close events that would have extended the " +
        "chain are counted") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.FunnelEvent]
      val guards = EventStream.StreamGuards(spark, "t_guard_tomb")
      val winUs = 1000000L // 1 s funnel window → timeout at t1 + 1 s
      val q = EventStream.funnelChain(
          mem.toDS().withWatermark("ts", "0 seconds"), winUs, guards)
        .writeStream.format("memory").queryName("t_guard_tomb")
        .outputMode("update").start()
      try {
        // batch 1: user 1 anchors at 1 s (timeout armed at 2 s);
        // user 2 is the clock that advances the watermark
        mem.addData(fe(1, 1000, "view"), fe(2, 1000, "view"))
        q.processAllAvailable()
        // batch 2 moves the watermark to 1 s (batch 1's max); batch 3
        // plans with watermark 10 s > 2 s → user 1's chain finalizes
        mem.addData(fe(2, 10000, "view"))
        q.processAllAvailable()
        mem.addData(fe(2, 20000, "view"))
        q.processAllAvailable()
        // batch 4: user 1 RETURNS above the watermark (30 s > 20 s).
        // Pre-fix, the evicted state re-anchored a second chain at 30 s
        // and the max()-reduce merged fields from two distinct chains;
        // the tombstone must ignore both events and count the click
        // (it would have set the still-unset t2 in the batch twin).
        mem.addData(fe(1, 30000, "view"), fe(1, 31000, "click"))
        q.processAllAvailable()
        val rows = spark.table("t_guard_tomb")
          .filter(col("user_id") === 1)
          .agg(max("t1").as("t1"), max("t2").as("t2")).head
        assert(rows.getLong(0) == 1000L * 1000,
          s"re-entry must not re-anchor: t1=${rows.getLong(0)}")
        assert(rows.isNullAt(1),
          s"re-entry must not extend a finalized chain: t2=${rows.get(1)}")
        assert(guards.anchorViolations.value == 1,
          "the post-close click (batch twin would set t2) must be counted")
      } finally q.stop()
    }
  }

  describe("sessionizer no-regress rule (z9/z15 family)") {

    it("a late in-session event cannot shrink the session tail: last " +
        "is max()-folded, duration holds, and the arrival is counted") {
      // pre-r14, an admitted out-of-order event REGRESSED state.last —
      // shrinking the reported duration and re-arming the eviction
      // timeout earlier than the session's true tail
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def se(u: Long, ms: Long) = EventStream.SessionEvent(
        u, ts(ms), "view")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.SessionEvent]
      val guards = EventStream.StreamGuards(spark, "t_guard_sess")
      val q = EventStream.sessionize(
          mem.toDS().withWatermark("ts", "1 hour"), gapMs = 10000, guards)
        .writeStream.format("memory").queryName("t_guard_sess")
        .outputMode("update").start()
      try {
        mem.addData(se(1, 50000), se(1, 60000)) // session tail at 60 s
        q.processAllAvailable()
        mem.addData(se(1, 55000)) // late, inside the session
        q.processAllAvailable()
        assert(guards.outOfOrder.value == 1)
        val last = spark.table("t_guard_sess")
          .orderBy(col("n_events").desc).head
        // 3 events, duration still 10 s (55 s did not regress the tail)
        assert(last.getLong(1) == 3, s"events: $last")
        assert(last.getLong(2) == 10000, s"duration must hold: $last")
      } finally q.stop()
    }
  }

  describe("the two late-data layers: Spark's watermark filter vs the guards") {

    it("a SUB-watermark late event is dropped by Spark before the state " +
        "machine (numRowsDroppedByWatermark), invisible to the guards") {
      // pins the layering claim in SCALE.md: the guards see exactly the
      // rows the watermark ADMITS; rows at-or-below the watermark never
      // reach funnelChain at all, and Spark accounts them in the state
      // operator's numRowsDroppedByWatermark metric instead
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.FunnelEvent]
      val guards = EventStream.StreamGuards(spark, "t_guard_wm")
      val q = EventStream.funnelChain(
          mem.toDS().withWatermark("ts", "0 seconds"),
          7L * 86400 * 1000000, guards)
        .writeStream.format("memory").queryName("t_guard_wm")
        .outputMode("update").start()
      try {
        mem.addData(fe(1, 100000, "view")) // watermark advances to 100 s
        q.processAllAvailable()
        mem.addData(fe(1, 5000, "view")) // 5 s << watermark: sub-watermark
        q.processAllAvailable()
        val dropped = q.recentProgress
          .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
        assert(dropped >= 1,
          s"Spark's own filter must account the sub-watermark row, " +
            s"got $dropped")
        assert(guards.anchorViolations.value == 0 &&
          guards.outOfOrder.value == 0,
          "the guards must never see a row the watermark already dropped")
      } finally q.stop()
    }
  }

  describe("funnel through the production foreachBatch JDBC terminal") {

    it("recovers the funnel across a checkpoint restart and reproduces " +
        "the batch z19 frame (at-least-once replay + keyed upsert = " +
        "exactly-once table)") {
      // The deployment claim for z21 (VERDICT r13 ask #3): state +
      // warehouse table survive a stop/restart. Drive: split the corpus
      // in two by event time, run the funnel through foreachBatch JDBC
      // upsert to completion on half 1 (real checkpoint), then
      // "restart" — a brand-new query over the SAME checkpoint + table
      // — after half 2 lands. The upsert key is user_id and the triple
      // is monotone with final fields, so any replayed batch overwrites
      // identical rows. Rolled up, the table must equal the batch z19
      // frame exactly: a user tombstoned by run 1's watermark has
      // t1 + 7 d < cut − 2 h < any half-2 event, so every event the
      // tombstone ignores falls outside the 7-day window in the batch
      // arm too — the rollup comparison is airtight, not approximate.
      val sf = "/root/testdata/sf0.001"
      val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-rst")
      val srcDir = tmp.resolve("src").toString
      val ckpt = tmp.resolve("ckpt").toString
      val dbDir = tmp.resolve("db").toString
      val events = EventStream.readEvents(spark, sf)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_type"))
      val cut = events.select(unix_micros(col("ts")).as("us"))
        .stat.approxQuantile("us", Array(0.5), 0.0)(0)
      events.filter(unix_micros(col("ts")) <= cut).coalesce(1)
        .write.mode("append").parquet(srcDir)
      def run() = EventStream.runFunnelToJdbc(spark, srcDir, events.schema,
        graft.operators.ExtensionOps.FunnelWindowUs, ckpt, dbDir,
        table = "t_funnel_rst", queryName = "t_funnel_rst_q")
      run() // run 1: half the corpus; checkpoint + Derby table persist
      events.filter(unix_micros(col("ts")) > cut).coalesce(1)
        .write.mode("append").parquet(srcDir)
      val jdbc = run() // run 2: fresh query, same checkpoint = restart
      val triples = jdbc.select(col("user_id"),
        when(col("t1") === -1, lit(null)).otherwise(col("t1")).as("t1"),
        when(col("t2") === -1, lit(null)).otherwise(col("t2")).as("t2"),
        when(col("t3") === -1, lit(null)).otherwise(col("t3")).as("t3"))
      val rolled = graft.operators.ExtensionOps.funnelRollup(triples)
        .collect().toSeq
      val batch = graft.SparkEntry.queries("z19_funnel")(spark, sf)
        .collect().toSeq
      assert(rolled == batch,
        s"restarted JDBC funnel table diverged: $rolled vs $batch")
      // the table holds exactly one row per funnel-entering user — the
      // upsert really keyed on user_id across the restart
      assert(jdbc.count() == jdbc.select("user_id").distinct().count())
      assert(jdbc.count() == batch.head.getLong(2))
    }
  }

  describe("opt-in horizon eviction bounds state lifetime (r14 ask #1)") {

    // feed both arms identically; only horizonUs differs
    def driveFunnel(name: String, horizonUs: Long) = {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.FunnelEvent]
      val guards = EventStream.StreamGuards(spark, s"t_$name")
      val q = EventStream.funnelChain(
          mem.toDS().withWatermark("ts", "0 seconds"),
          winUs = 1000000L, guards = guards, horizonUs = horizonUs)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      // batch 1: two real chains anchor at 1 s (close timeout at 2 s,
      // horizon drop at 2 s + 2 s = 4 s when bounded)
      mem.addData(fe(1, 1000, "view"), fe(1, 1500, "click"),
        fe(2, 1000, "view"))
      q.processAllAvailable()
      // clock batches (user 99 never anchors — event outside the
      // funnel alphabet): wm 1.5 s → 10 s → 20 s. Batch 3 plans with
      // wm 10 s > 2 s → chains close and (bounded) re-arm the horizon
      // clamped above the 10 s watermark; batch 4 plans with wm 20 s
      // → the horizon fires and the tombstones drop
      mem.addData(fe(99, 10000, "other"))
      q.processAllAvailable()
      mem.addData(fe(99, 20000, "other"))
      q.processAllAvailable()
      mem.addData(fe(99, 30000, "other"))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      (mem, q, guards, stateRows)
    }

    it("funnel: tombstones drop after the lateness horizon — state rows " +
        "shrink while pre-horizon output is unchanged, and each eviction " +
        "is counted") {
      val (_, qc, gc, rowsControl) = driveFunnel("t_hz_ctl", Long.MaxValue)
      val (mem, qh, gh, rowsHorizon) = driveFunnel("t_hz_on", 2000000L)
      try {
        // control: users 1, 2 tombstoned + the anchor-less clock = 3
        // rows forever; horizon arm: both tombstones dropped, only the
        // clock's (itself horizon-armed) entry remains
        assert(rowsControl == 3, s"control state rows: $rowsControl")
        assert(rowsHorizon == 1, s"horizon state rows: $rowsHorizon")
        assert(gc.horizonEvictions.value == 0)
        assert(gh.horizonEvictions.value == 2,
          s"both tombstones must be counted: ${gh.horizonEvictions.value}")
        // PRE-horizon output identical: the max-reduced triples agree
        def triples(t: String) = spark.table(t)
          .filter(col("user_id") < 99)
          .groupBy("user_id").agg(max("t1").as("t1"), max("t2").as("t2"),
            max("t3").as("t3"))
          .orderBy("user_id").collect().toSeq
        assert(triples("t_hz_on") == triples("t_hz_ctl"),
          "horizon eviction must not change pre-horizon emissions")
        // the documented trade, pinned: a user returning BEYOND the
        // horizon re-anchors a fresh chain (in the control arm the
        // tombstone would have counted it instead) — the eviction
        // count bounds how many keys can have re-keyed this way
        mem.addData(fe(1, 40000, "view"))
        qh.processAllAvailable()
        val t1s = spark.table("t_hz_on").filter(col("user_id") === 1)
          .select(col("t1")).distinct().collect().map(_.getLong(0)).sorted
        assert(t1s.toSeq == Seq(1000000L, 40000000L),
          s"post-horizon return must re-anchor a fresh chain: ${t1s.toSeq}")
        assert(gh.anchorViolations.value == 0,
          "the re-anchor is the accepted trade, not a breach")
      } finally { qc.stop(); qh.stop() }
    }

    it("retention: state drops once the watermark passes the mask's " +
        "inert point + horizon, with the emitted cohort frame unchanged") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def drive(name: String, horizonUs: Long) = {
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[EventStream.FunnelEvent]
        val guards = EventStream.StreamGuards(spark, s"t_$name")
        val weekUs = 1000000L // 1 s weeks → mask inert 64 s past anchor
        val q = EventStream.retentionHits(
            mem.toDS().withWatermark("ts", "0 seconds"), weekUs, guards,
            horizonUs = horizonUs)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        // user 1 anchors at 10 s (eviction due at 10+64+1 = 75 s);
        // user 2's batches advance the watermark to 200 s, then 210 s
        // — batch 3 plans with wm 200 s > 75 s and user 1 drops
        mem.addData(fe(1, 10000, "view"))
        q.processAllAvailable()
        mem.addData(fe(2, 200000, "view"))
        q.processAllAvailable()
        mem.addData(fe(2, 210000, "view"))
        q.processAllAvailable()
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        q.stop()
        (guards, stateRows)
      }
      val (gc, rowsControl) = drive("t_hz_ret_ctl", Long.MaxValue)
      val (gh, rowsHorizon) = drive("t_hz_ret_on", 1000000L)
      assert(rowsControl == 2, s"control keeps every user ever: $rowsControl")
      assert(rowsHorizon == 1, s"inert state must drop: $rowsHorizon")
      assert(gc.horizonEvictions.value == 0)
      assert(gh.horizonEvictions.value == 1)
      // identical emissions either way: user 1 week 0; user 2 weeks 0, 10
      def hits(t: String) = spark.table(t)
        .select("user_id", "week_offset").orderBy("user_id", "week_offset")
        .collect().toSeq
      assert(hits("t_hz_ret_on") == hits("t_hz_ret_ctl"),
        "horizon eviction must not change the emitted cohort frame")
      assert(hits("t_hz_ret_on").map(r => (r.getLong(0), r.getLong(1))) ==
        Seq((1L, 0L), (2L, 0L), (2L, 10L)))
    }
  }

  describe("retention guard counters (z22 contract breach)") {

    it("counts below-anchor late events and mask-overflow weeks instead " +
        "of silently corrupting the cohort frame") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.FunnelEvent]
      val guards = EventStream.StreamGuards(spark, "t_guard_ret")
      val weekUs = 1000000L // 1 s weeks keep the fixture readable
      val q = EventStream.retentionHits(
          mem.toDS().withWatermark("ts", "1 hour"), weekUs, guards)
        .writeStream.format("memory").queryName("t_guard_ret")
        .outputMode("append").start()
      try {
        mem.addData(fe(1, 10000, "view")) // anchor at 10 s, week-0 hit
        q.processAllAvailable()
        // late event BELOW the anchor: the batch twin would re-anchor
        // the whole cohort; the stream drops it and counts the breach
        // (pre-fix, its negative offset silently hit `1L << -5` =
        // bucket 59 — a corrupted emission, not even a clean drop)
        mem.addData(fe(1, 5000, "view"))
        q.processAllAvailable()
        assert(guards.anchorViolations.value == 1)
        // offset 70 outgrows the 64-bit mask: dropped LOUDLY (ADVICE
        // r13: z22 under-reports vs z20 past ~15 months — the counter
        // is the signal that the corpus outgrew the state shape)
        mem.addData(fe(1, 10000 + 70 * 1000, "view"))
        q.processAllAvailable()
        assert(guards.maskOverflow.value == 1)
        val hits = spark.table("t_guard_ret")
        assert(hits.count() == 1, "only the week-0 hit may emit")
        assert(hits.agg(min("week_offset"), max("week_offset"))
          .head.toSeq == Seq(0L, 0L),
          "no negative or >=64 offset may ever reach the sink")
      } finally q.stop()
    }
  }
}
