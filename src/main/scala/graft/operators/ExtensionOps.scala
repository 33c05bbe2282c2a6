package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.{QueryDef, Tables => T}
import graft.multimodal.Multimodal
import graft.streaming.EventStream

/** Multimodal and event/streaming operators exposed through the driver
  * contract. */
object ExtensionOps {

  /** Funnel contract shared by the batch arm (z19), the streaming arm
    * (z21), and their common DuckDB oracle: steps view → click →
    * purchase, completion window 7 days in exact micros. Hoisted so the
    * three can never silently diverge. */
  private[graft] val FunnelWindowUs: Long = 7L * 86400 * 1000000

  /** Roll a per-user (t1, t2, t3) step-time frame (micros, null = step
    * not reached) into the 3-row funnel summary. */
  private[graft] def funnelRollup(perUser: DataFrame): DataFrame =
    perUser.agg(
        count(col("t1")).as("u1"),
        count(when(col("t2").isNotNull &&
          col("t2") - col("t1") <= FunnelWindowUs, 1)).as("u2"),
        count(when(col("t3").isNotNull &&
          col("t3") - col("t1") <= FunnelWindowUs, 1)).as("u3"))
      .select(expr(
        """stack(3, 1, 'view', u1, 2, 'click', u2, 3, 'purchase', u3)
           as (step, event_type, users)"""), col("u1"))
      .select(col("step"), col("event_type"), col("users"),
        when(col("u1") === 0, lit(null))
          .otherwise(round(col("users") / col("u1"), 4))
          .as("pct_of_entry"))
      .orderBy("step")

  private val FunnelOracle: String =
    s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us,
       |        event_type FROM events
       |      WHERE event_type IN ('view', 'click', 'purchase')),
       |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
       |        OVER (PARTITION BY user_id) AS t1 FROM e),
       |b AS (SELECT *, min(CASE WHEN event_type = 'click'
       |                          AND us > t1 THEN us END)
       |        OVER (PARTITION BY user_id) AS t2 FROM a),
       |c AS (SELECT *, min(CASE WHEN event_type = 'purchase'
       |                          AND us > t2 THEN us END)
       |        OVER (PARTITION BY user_id) AS t3 FROM b),
       |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2,
       |             max(t3) AS t3 FROM c GROUP BY 1),
       |k AS (SELECT count(t1) AS u1,
       |             count(CASE WHEN t2 IS NOT NULL
       |                         AND t2 - t1 <= $FunnelWindowUs
       |                        THEN 1 END) AS u2,
       |             count(CASE WHEN t3 IS NOT NULL
       |                         AND t3 - t1 <= $FunnelWindowUs
       |                        THEN 1 END) AS u3 FROM u)
       |SELECT step, event_type, users,
       |       CASE WHEN u1 = 0 THEN NULL
       |            ELSE round(users / u1, 4) END AS pct_of_entry
       |FROM (SELECT 1 AS step, 'view' AS event_type, u1 AS users, u1
       |        FROM k
       |      UNION ALL SELECT 2, 'click', u2, u1 FROM k
       |      UNION ALL SELECT 3, 'purchase', u3, u1 FROM k)
       |ORDER BY step""".stripMargin

  /** Rolling-week length shared by the batch (z20) and streaming (z22)
    * retention arms and their common oracle. */
  private val RetentionWeekUs: Long = 7L * 86400 * 1000000

  /** Roll a (user_id, cohort, week_offset) activity frame into the
    * cohort-retention summary — tolerant of either one row per EVENT
    * (z20's window output) or one row per (user, week) (z22's
    * append-only stream hits): the distinct count collapses both. */
  private def retentionRollup(marked: DataFrame): DataFrame = {
    val act = marked.groupBy("cohort", "week_offset")
      .agg(countDistinct("user_id").as("active_users"))
    val w2 = Window.partitionBy("cohort")
    act.withColumn("cohort_users",
        max(when(col("week_offset") === 0, col("active_users"))).over(w2))
      .select(col("cohort"), col("week_offset"), col("active_users"),
        round(col("active_users") / col("cohort_users"), 4)
          .as("retention_pct"))
      .orderBy("cohort", "week_offset")
  }

  private val RetentionOracle: String =
    s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us
       |       FROM events),
       |f AS (SELECT user_id, us,
       |             min(us) OVER (PARTITION BY user_id) AS first_us
       |      FROM e),
       |m AS (SELECT user_id,
       |             CAST(make_timestamp(first_us) AS DATE) AS cohort,
       |             (us - first_us) // $RetentionWeekUs AS week_offset
       |      FROM f),
       |a AS (SELECT cohort, week_offset,
       |             count(DISTINCT user_id) AS active_users
       |      FROM m GROUP BY 1, 2),
       |w AS (SELECT *,
       |             max(CASE WHEN week_offset = 0
       |                      THEN active_users END)
       |               OVER (PARTITION BY cohort) AS cohort_users
       |      FROM a)
       |SELECT cohort, week_offset, active_users,
       |       round(active_users / cohort_users, 4) AS retention_pct
       |FROM w ORDER BY cohort, week_offset""".stripMargin

  /** Run the z24 streaming CMS through the PRODUCTION terminal (VERDICT
    * r14 ask #2): update-mode `foreachBatch` upserting each batch's
    * CHANGED cells into a JDBC (Derby) table keyed on (rw, cl) — the
    * warehouse shape of a live heavy-hitters sketch. foreachBatch
    * delivery is at-least-once under restart recovery, and CMS cells
    * merge by SUM (not idempotent — CmsSpec pins that a replayed shard
    * double-counts) — but the STREAM, not the sink, owns the summing:
    * the state store maintains each cell's cumulative count exactly-
    * once (the commit log replays a batch into the same state version),
    * and every emission of a cell is therefore MONOTONE nondecreasing.
    * So the funnel's trick applies verbatim: a replayed batch's upsert
    * overwrites identical-or-newer values and the TABLE converges to
    * exactly-once state. Source, checkpoint, and warehouse paths are
    * explicit so a caller (the restart spec) can stop the query, append
    * late files, and restart the SAME checkpoint — proving state + sink
    * survive a kill/restart and still reproduce the batch-computed
    * sketch bit-for-bit. */
  def runCmsToJdbc(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, srcSchema: org.apache.spark.sql.types.StructType,
      ckpt: String, dbDir: String, table: String = "cms_jdbc",
      queryName: String = "event_cms_jdbc",
      stateShards: Int = EventStream.DefaultStateShards): DataFrame =
    runSketchToJdbc(spark,
      cmsCellCounts(spark.readStream.schema(srcSchema).parquet(srcDir)),
      Seq("rw", "cl"), ckpt, dbDir, table, queryName, stateShards)

  /** z25's histogram through the same terminal: cells keyed on
    * (event_type, bin), identical convergence argument. */
  def runQuantToJdbc(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, srcSchema: org.apache.spark.sql.types.StructType,
      ckpt: String, dbDir: String, table: String = "quant_jdbc",
      queryName: String = "event_quant_jdbc",
      stateShards: Int = EventStream.DefaultStateShards): DataFrame =
    runSketchToJdbc(spark,
      quantBinCounts(spark.readStream.schema(srcSchema).parquet(srcDir)),
      Seq("event_type", "bin"), ckpt, dbDir, table, queryName, stateShards)

  /** The shared terminal: run a monotone streaming cell aggregation to
    * completion through update-mode `foreachBatch` upserting into a
    * JDBC (Derby) table keyed on the cell coordinates, and read the
    * table back. Preconditions the two callers establish: the
    * aggregation's per-key values are MONOTONE nondecreasing across
    * emissions (the state store owns the counting — a replayed batch
    * re-emits the same cumulative values), so the at-least-once
    * foreachBatch delivery converges the table to exactly-once state. */
  private def runSketchToJdbc(spark: org.apache.spark.sql.SparkSession,
      agg: DataFrame, keys: Seq[String], ckpt: String, dbDir: String,
      table: String, queryName: String, stateShards: Int): DataFrame =
    EventStream.withStateShards(spark, stateShards) {
      import graft.sources.Jdbc
      val url = Jdbc.derbyUrl(dbDir)
      val q = agg.writeStream
        .queryName(queryName)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch((batch: DataFrame, _: Long) =>
          Jdbc.upsertBatch(batch, url, table, keys))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Jdbc.readAll(spark, url, table)
    }

  /** z25 histogram geometry: QBins fixed bins of width QWidth cover
    * values in [0, QBins·QWidth) = [0, 1024); out-of-range values
    * clamp into the edge bins so the state bound holds for ANY input.
    * QWidth is a power of two — value/QWidth is exact in IEEE double
    * arithmetic, so the engine and the DuckDB oracle bin identically.
    * Declared ABOVE `defs`: the oracle strings interpolate these
    * EAGERLY at object init, and a val declared after `defs` would
    * read as its zero default there (found the hard way — the oracle
    * briefly baked `/ 0.0`). */
  private[graft] val QWidth = 0.25
  private[graft] val QBins = 4096

  /** The z24 CMS cell-count aggregation over an events frame (batch OR
    * streaming — both are one declarative groupBy) — shared by the
    * QueryDef, the JDBC terminal, and the specs so the hash/cell
    * geometry can never fork between the oracled query and the
    * production sink (review r15: it briefly lived in three copies —
    * the same divergence class as the baked oracle literals). */
  private[graft] def cmsCellCounts(
      events: org.apache.spark.sql.Dataset[_]): DataFrame =
    events
      .select(graft.functions.PolyHash64
        .polyhash64(col("user_id").cast("string")).as("h"))
      .select(TextOps.cmsCells.as("rc"))
      .groupBy(col("rc.rw").as("rw"), col("rc.cl").as("cl"))
      .agg(count(lit(1)).as("cnt"))

  /** The z25 clamped-bin histogram aggregation — same sharing contract
    * as [[cmsCellCounts]]. */
  private[graft] def quantBinCounts(
      events: org.apache.spark.sql.Dataset[_]): DataFrame =
    events
      .select(col("event_type"),
        least(greatest(floor(col("value") / QWidth), lit(0.0)),
          lit((QBins - 1).toDouble)).cast("long").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))

  val defs: Seq[QueryDef] = Seq(

    // Multimodal asset profile over binary columns: per-modality counts,
    // byte volume (length of the BINARY content), mean duration. Fully
    // oracled — the synthetic-asset rules are arithmetic on `documents`
    // (modality ⇔ doc_id % 3, content = UTF-8 text bytes, duration_ms =
    // n_chars×10); the stub-codec feature path (hash-derived, not ANSI
    // SQL) is gold-tested in ExtensionsSpec instead.
    QueryDef(
      "z1_multimodal_profile",
      (s, d) => Multimodal.syntheticAssets(T.documents(s, d))
        .groupBy("modality")
        .agg(count(lit(1)).as("n_assets"),
          sum(length(col("content"))).as("total_bytes"),
          round(avg(col("meta.duration_ms")), 4).as("avg_duration_ms"))
        .orderBy("modality"),
      Some("""SELECT CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                       ELSE 'video' END AS modality,
                     count(*) AS n_assets,
                     CAST(sum(octet_length(encode(text))) AS BIGINT)
                       AS total_bytes,
                     round(avg(n_chars * 10), 4) AS avg_duration_ms
              FROM documents GROUP BY 1 ORDER BY 1""")),

    // Video frame sampling fan-out (one row per sampled frame). Oracle:
    // the synthetic-asset rules are arithmetic on `documents` — video ⇔
    // doc_id % 3 = 2, duration_ms = n_chars*10, frames = ⌊dur/200⌋ + 1
    // (sequence(0, dur, 200) is stop-inclusive).
    QueryDef(
      "z2_frame_sample",
      (s, d) => Multimodal.sampleFrames(
          Multimodal.syntheticAssets(T.documents(s, d)), everyMs = 200)
        .groupBy("asset_id").agg(count(lit(1)).as("n_frames"))
        .orderBy("asset_id"),
      Some("""SELECT doc_id AS asset_id,
                     CAST(n_chars * 10 // 200 + 1 AS BIGINT) AS n_frames
              FROM documents WHERE doc_id % 3 = 2 ORDER BY asset_id""")),

    // Hourly event rollup (batch view of the streaming windowed agg;
    // nanos timestamps normalized on read).
    QueryDef(
      "z3_events_hourly",
      (s, d) => EventStream.readEvents(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
        .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
                     count(*) AS n, round(sum(value), 4) AS total_value
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Gap-based sessionization: a new session starts after >6 h of
    // user inactivity (median intra-user gap in this corpus is ~7.3 h).
    // Scale shape: every window is PARTITIONED BY user_id — one hash
    // shuffle on the natural key, no global ordering anywhere; the
    // per-user session roll-up then reuses the same partitioning.
    // All gap arithmetic is exact integer micros (see readEvents).
    QueryDef(
      "z5_sessionize",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val gapUs = 6L * 3600 * 1000000
        val sess = e
          .withColumn("new_s",
            when(lag("us", 1).over(w).isNull ||
              col("us") - lag("us", 1).over(w) > gapUs, 1L).otherwise(0L))
          .withColumn("sid", sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sess.groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum("n").as("n_events"),
            max("n").as("max_session_events"),
            round(avg("n"), 4).as("avg_session_events"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
                       epoch_ns(ts) // 1000 AS us FROM events),
              o AS (SELECT user_id, us, event_id,
                      CASE WHEN lag(us) OVER
                             (PARTITION BY user_id ORDER BY us, event_id)
                             IS NULL
                        OR us - lag(us) OVER
                             (PARTITION BY user_id ORDER BY us, event_id)
                           > 21600000000 THEN 1 ELSE 0 END AS new_s
                    FROM e),
              sess AS (SELECT user_id,
                         sum(new_s) OVER (PARTITION BY user_id
                           ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS sid
                       FROM o),
              g AS (SELECT user_id, sid, count(*) AS n
                    FROM sess GROUP BY 1, 2)
              SELECT user_id, count(*) AS n_sessions,
                     CAST(sum(n) AS BIGINT) AS n_events,
                     max(n) AS max_session_events,
                     round(avg(n), 4) AS avg_session_events
              FROM g GROUP BY 1 ORDER BY 1""")),

    // As-of join: each purchase is matched to the user's most recent
    // click at-or-before it (the canonical temporal-attribution join).
    // Spark lacks ASOF JOIN, so it is composed scalably: union the two
    // event streams, one partitioned window per user carrying
    // last(click, ignoreNulls) forward — O(n log n) per user, never the
    // O(n·m) inequality join. (user_id, ts) is unique in the corpus so
    // the matched click is deterministic. Oracle uses DuckDB's native
    // ASOF JOIN on the identical micros normalization.
    QueryDef(
      "z6_asof_join",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"),
            when(col("event_type") === "click", col("event_id")).as("c_id"),
            when(col("event_type") === "click", unix_micros(col("ts")))
              .as("c_us"))
        // clicks sort before purchases at equal instants (ASOF allows
        // equality), then event_id for a total order
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"),
            (col("event_type") === "click").cast("int").desc, col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("prev_click_id",
            last("c_id", ignoreNulls = true).over(w))
          .withColumn("prev_click_us",
            last("c_us", ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" &&
            col("prev_click_id").isNotNull)
          .select(col("event_id"), col("prev_click_id"),
            expr("(us - prev_click_us) div 1000000").as("gap_sec"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
                       epoch_ns(ts) // 1000 AS us FROM events)
              SELECT p.event_id, c.event_id AS prev_click_id,
                     (p.us - c.us) // 1000000 AS gap_sec
              FROM (SELECT * FROM e WHERE event_type = 'purchase') p
              ASOF JOIN (SELECT * FROM e WHERE event_type = 'click') c
                ON p.user_id = c.user_id AND p.us >= c.us
              ORDER BY p.event_id""")),

    // Range (interval) join: views by the same user in the 6 h before
    // each error. Scale shape: instead of the unbounded inequality join
    // (O(n·m) per user), each error explodes into exactly TWO coarse
    // 6 h time buckets and joins views on (user, bucket) equality —
    // bounded fan-out, ordinary hash join, exact range re-check after.
    // A view's single bucket matches at most one candidate, so no dedup.
    QueryDef(
      "z7_range_join",
      (s, d) => {
        val winUs = 6L * 3600 * 1000000
        val e = EventStream.readEvents(s, d)
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("bkt", explode(array(
            expr(s"us div $winUs"), expr(s"us div $winUs - 1"))))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
            unix_micros(col("ts")).as("v_us"))
          .withColumn("v_bkt", expr(s"v_us div $winUs"))
        errors.join(views,
            col("user_id") === col("v_user") && col("bkt") === col("v_bkt") &&
              col("v_us") <= col("us") && col("v_us") > col("us") - winUs,
            "left")
          .groupBy("event_id").agg(count(col("v_id")).as("n_views"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
                       epoch_ns(ts) // 1000 AS us FROM events)
              SELECT er.event_id, count(v.event_id) AS n_views
              FROM (SELECT * FROM e WHERE event_type = 'error') er
              LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
                ON er.user_id = v.user_id AND v.us <= er.us
                   AND v.us > er.us - 21600000000
              GROUP BY 1 ORDER BY 1""")),

    // True Structured Streaming execution (AvailableNow → memory sink).
    // Fully oracled: complete-mode output over a finite AvailableNow run
    // is the COMPLETE final result, which equals the z3 batch hour
    // rollup keyed by window.start — so the oracle is z3's SQL with the
    // window start aliased `ws` (1-hour tumbling windows start on the
    // hour ⇔ date_trunc('hour', ts)).
    QueryDef(
      "z4_stream_windowed",
      (s, d) => EventStream.runWindowedOnce(s, d,
          queryName = s"graft_stream_${graft.etl.ScaleUtils.pathTag(d)}")
        .select(col("window.start").as("ws"), col("event_type"), col("n"),
          round(col("total_value"), 4).as("total_value"))
        .orderBy("ws", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS ws, event_type,
                     count(*) AS n, round(sum(value), 4) AS total_value
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Spark-NATIVE sessionization: the built-in session_window operator
    // (gap-merged event-time windows, batch + streaming since 3.2) —
    // the declarative twin of the custom-state z9 path; Catalyst plans
    // it as a single user-partitioned aggregation, no window functions,
    // no custom state. Boundary semantics differ from z5's by design:
    // session_window merges strictly-overlapping windows, so a gap of
    // EXACTLY 6 h starts a new session (z5's `> gap` keeps it) — the
    // oracle mirrors with `>= gap` as the break. Exact integer micros.
    QueryDef(
      "z10_session_window",
      (s, d) => EventStream.readEvents(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "6 hours").as("sw"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), unix_micros(col("sw.start")).as("s_us"),
          col("n"))
        .orderBy("user_id", "s_us"),
      Some("""WITH e AS (SELECT user_id,
                       epoch_ns(ts) // 1000 AS us FROM events),
              o AS (SELECT user_id, us,
                      CASE WHEN us - lag(us) OVER
                             (PARTITION BY user_id ORDER BY us)
                           >= 21600000000 THEN 1 ELSE 0 END AS brk
                    FROM e),
              s AS (SELECT user_id, us,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS sid
                    FROM o)
              SELECT user_id, min(us) AS s_us, count(*) AS n
              FROM s GROUP BY user_id, sid ORDER BY 1, 2""")),

    // STREAMING sessionization — the custom-state face of the streaming
    // surface as a CONTRACT query: real mapGroupsWithState execution
    // (update-mode memory sink, event-time timeout eviction armed —
    // EventStream.sessionize). One data batch over the single-file
    // source ⇒ each user's row is its FINAL session; the timeout
    // no-data batch re-emits evicted users' identical session, folded
    // by the distinct. Gap arithmetic is MILLISECONDS (Timestamp
    // .getTime truncates micros→ms), mirrored exactly in the oracle
    // (epoch_ns // 1000000).
    QueryDef(
      "z9_stream_sessions",
      (s, d) => EventStream.runSessionizeOnce(s, d,
          gapMs = 6L * 3600 * 1000,
          queryName = s"graft_sess_${graft.etl.ScaleUtils.pathTag(d)}")
        .select(col("user_id"), col("n_events"), col("duration_ms"))
        .distinct()
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id,
                       epoch_ns(ts) // 1000000 AS ms FROM events),
              o AS (SELECT user_id, ms,
                      CASE WHEN ms - lag(ms) OVER
                             (PARTITION BY user_id ORDER BY ms)
                           > 21600000 THEN 1 ELSE 0 END AS brk
                    FROM e),
              s AS (SELECT user_id, ms,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS sid
                    FROM o),
              last AS (SELECT user_id, max(sid) AS msid
                       FROM s GROUP BY 1)
              SELECT s.user_id, count(*) AS n_events,
                     max(s.ms) - min(s.ms) AS duration_ms
              FROM s JOIN last ON s.user_id = last.user_id
                              AND s.sid = last.msid
              GROUP BY 1 ORDER BY 1""")),

    // APPEND-mode streaming — the unbounded-feed deployment shape: a
    // window emits exactly once when the watermark (max event time − 2 h,
    // tracked in whole milliseconds) passes its END, and its state is
    // evicted. Real Structured Streaming executes; the OUTPUT is still
    // deterministic relational semantics, so unlike z4 this one is fully
    // DuckDB-oracled: the batch rollup restricted to closed windows
    // (window end ≤ watermark — Spark evicts on `end <= wm`). The first
    // oracled streaming query in the contract.
    QueryDef(
      "z8_stream_append",
      (s, d) => EventStream.runWindowedAppendOnce(s, d,
          queryName = s"graft_stream_ap_${graft.etl.ScaleUtils.pathTag(d)}")
        .select(col("window.start").as("ws"), col("event_type"), col("n"),
          round(col("total_value"), 4).as("total_value"))
        .orderBy("ws", "event_type"),
      Some("""WITH wm AS (SELECT epoch_ns(max(ts)) // 1000000 - 7200000
                       AS w_ms FROM events)
              SELECT date_trunc('hour', ts) AS ws, event_type,
                     count(*) AS n, round(sum(value), 4) AS total_value
              FROM events, wm
              GROUP BY 1, 2, wm.w_ms
              HAVING epoch_ns(date_trunc('hour', ts)) // 1000000
                       + 3600000 <= wm.w_ms
              ORDER BY 1, 2""")),

    // The BUILT-IN session_window as a real append-mode STREAM: the
    // declarative twin of z15. Session windows are half-open
    // [ts, ts+gap), so two events EXACTLY gap apart do not overlap and
    // a gap of exactly 6 h starts a new session — same convention as
    // z10, mirrored as `>= gap` breaks in the oracle. A session emits
    // once when the watermark (max event ms − 2 h) passes its end
    // (last + gap) and its state evicts; sessions ending inside the
    // final horizon stay open and unemitted.
    QueryDef(
      "z16_stream_session_window",
      (s, d) => EventStream.runSessionWindowOnce(s, d,
          queryName = s"graft_sess_win_${graft.etl.ScaleUtils.pathTag(d)}")
        .orderBy("user_id", "s_us"),
      Some("""WITH e AS (SELECT user_id,
                       epoch_ns(ts) // 1000 AS us FROM events),
              o AS (SELECT user_id, us,
                      CASE WHEN us - lag(us) OVER
                             (PARTITION BY user_id ORDER BY us)
                           >= 21600000000 THEN 1 ELSE 0 END AS brk
                    FROM e),
              s AS (SELECT user_id, us,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS sid
                    FROM o),
              sess AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS l_us,
                              count(*) AS n
                       FROM s GROUP BY 1, 2),
              wm AS (SELECT (epoch_ns(max(ts)) // 1000000 - 7200000) * 1000
                       AS w_us FROM events)
              SELECT user_id, s_us, n
              FROM sess, wm
              WHERE l_us + 21600000000 <= wm.w_us
              ORDER BY 1, 2""")),

    // FULL-history append-mode streaming sessionization
    // (flatMapGroupsWithState): every gap-closed session emits in-batch;
    // open sessions emit only when the watermark passes last+gap
    // (timeout eviction), so sessions inside the final watermark
    // horizon stay unemitted — the closed-only discipline of z8, now
    // for CUSTOM state. Oracle: the z5/z9 session derivation, emitted
    // iff another session follows for the same user (gap-closed) OR
    // last + gap < final watermark (timeout-closed; Spark filters
    // timed-out state with a STRICT `timeoutTimestamp < watermark` —
    // armed == watermark stays open, pinned by the ExtensionsSpec
    // boundary test — unlike the built-in windows' `end <= wm`).
    QueryDef(
      "z15_stream_sessions_all",
      (s, d) => EventStream.runSessionizeAllOnce(s, d,
          gapMs = 6L * 3600 * 1000,
          queryName = s"graft_sess_all_${graft.etl.ScaleUtils.pathTag(d)}")
        .orderBy("user_id", "s_ms"),
      Some("""WITH e AS (SELECT user_id,
                       epoch_ns(ts) // 1000000 AS ms FROM events),
              o AS (SELECT user_id, ms,
                      CASE WHEN ms - lag(ms) OVER
                             (PARTITION BY user_id ORDER BY ms)
                           > 21600000 THEN 1 ELSE 0 END AS brk
                    FROM e),
              s AS (SELECT user_id, ms,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS sid
                    FROM o),
              sess AS (SELECT user_id, sid, min(ms) AS s_ms, max(ms) AS l_ms,
                              count(*) AS n_events
                       FROM s GROUP BY 1, 2),
              wm AS (SELECT max(ms) - 7200000 AS w FROM e)
              SELECT user_id, s_ms, n_events, l_ms - s_ms AS duration_ms
              FROM sess, wm
              WHERE sid < (SELECT max(sid) FROM sess s2
                           WHERE s2.user_id = sess.user_id)
                 OR l_ms + 21600000 < wm.w
              ORDER BY 1, 2""")),

    // Semi-structured payload extraction: the events `props` column is
    // a JSON string; parse it ONCE per row with a declared schema
    // (from_json — no schema inference pass, the only shape that works
    // on a 100 TB feed) and aggregate the typed field. All compared
    // values integer-exact; map-side combinable agg on a 5-key shuffle.
    QueryDef(
      "z14_json_props",
      (s, d) => EventStream.readEvents(s, d)
        .select(col("event_type"),
          from_json(col("props"), StructType(Seq(
            StructField("k", IntegerType)))).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
                     CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
                     min(CAST(props->>'k' AS INT)) AS min_k,
                     max(CAST(props->>'k' AS INT)) AS max_k
              FROM events GROUP BY 1 ORDER BY 1""")),

    // STREAM-STREAM interval join as a contract query: both sides are
    // watermarked streams; buffered state is evicted once the other
    // side's watermark passes the interval bound — the only join
    // formulation that survives an unbounded feed. Over the single-file
    // AvailableNow run every row of both sides arrives in micro-batch 1
    // and inner-join matches emit on arrival (state eviction only
    // affects LATER batches), so the complete output equals the batch
    // interval join — which is exactly what the oracle replays in
    // micros-exact integer arithmetic. Third oracled streaming query;
    // first oracled stream-stream JOIN.
    QueryDef(
      "z13_stream_join",
      (s, d) => EventStream.runIntervalJoinOnce(s, d,
          queryName = s"graft_stream_j_${graft.etl.ScaleUtils.pathTag(d)}")
        .select(col("purchase_id"), col("click_id"))
        .orderBy("purchase_id", "click_id"),
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id
              FROM events p, events c
              WHERE p.event_type = 'purchase' AND c.event_type = 'click'
                AND c.user_id = p.user_id
                AND epoch_ns(c.ts) // 1000 <= epoch_ns(p.ts) // 1000
                AND epoch_ns(c.ts) // 1000
                    > epoch_ns(p.ts) // 1000 - 21600000000
              ORDER BY 1, 2""")),

    // REAL-codec round trip, image arm: paint WxH pixels from integer
    // rules of doc_id, PNG-encode AND PNG-decode through javax.imageio
    // in one partition-local pass, emit exact integer channel sums.
    // PNG is lossless, so the oracle recomputes the sums from the paint
    // rules alone — a real encode→decode cycle value-checked by DuckDB,
    // not stub arithmetic. (The double-luma decode path stays
    // gold-tested in ExtensionsSpec; this query keeps every compared
    // value integer-exact.)
    QueryDef(
      "z11_image_roundtrip",
      (s, d) => Multimodal.imageRoundTrip(T.documents(s, d))
        .orderBy("asset_id"),
      Some("""SELECT doc_id AS asset_id,
                     CAST(doc_id % 13 + 4 AS INT) AS dec_width,
                     CAST(doc_id % 11 + 4 AS INT) AS dec_height,
                     CAST(sum((doc_id*31 + x.range*7 + y.range*13) % 256)
                       AS BIGINT) AS sum_r,
                     CAST(sum((doc_id*17 + x.range*11 + y.range*5) % 256)
                       AS BIGINT) AS sum_g,
                     CAST(sum((doc_id*29 + x.range*3 + y.range*19) % 256)
                       AS BIGINT) AS sum_b
              FROM documents, range(16) x, range(14) y
              WHERE doc_id % 3 = 0
                AND x.range < doc_id % 13 + 4
                AND y.range < doc_id % 11 + 4
              GROUP BY doc_id ORDER BY asset_id""")),

    // REAL-codec round trip, audio arm: synthesize 16-bit PCM from
    // integer rules, WAV-encode via javax.sound and decode back through
    // AudioCodec. Every RMS term is (s/32768)² — binary-exact doubles
    // whose ≤69-term sum fits a 53-bit mantissa losslessly — so even
    // the floating-point column is bit-deterministic and the oracle
    // reproduces it exactly from the rules.
    QueryDef(
      "z12_audio_roundtrip",
      (s, d) => Multimodal.audioRoundTrip(T.documents(s, d))
        .orderBy("asset_id"),
      Some("""WITH smp AS (
                SELECT doc_id,
                       ((doc_id*7919 + i.range*104729) % 65536) - 32768 AS s
                FROM documents, range(69) i
                WHERE doc_id % 3 = 1 AND i.range < doc_id % 50 + 20)
              SELECT doc_id AS asset_id,
                     CAST(8000 AS INT) AS dec_sample_rate,
                     CAST(1 AS INT) AS dec_channels,
                     CAST(round((doc_id % 50 + 20) / 8.0, 0) AS BIGINT)
                       AS dec_duration_ms,
                     sqrt(sum((s/32768.0)*(s/32768.0)) / count(*)) AS rms
              FROM smp GROUP BY doc_id ORDER BY asset_id""")),

    // REAL-codec round trip, video arm: paint per-frame grayscale
    // pixels from integer rules, JPEG-encode each frame, concatenate
    // into an actual MJPEG stream, split it back by SOI/EOI marker
    // scan and decode every frame through javax.imageio. JPEG is
    // LOSSY, so unlike z11/z12 the pixel values are gold-tested (luma
    // tolerance, ExtensionsSpec) rather than oracled — but the
    // container structure is bit-exact: frame count and per-frame
    // decoded dimensions are integer functions of the rules, which
    // DuckDB recomputes from the rules alone. Closes the last
    // multimodal stub: image (z11), audio (z12), video (z17) all
    // exercise real JDK codecs against the oracle gate.
    QueryDef(
      "z17_video_roundtrip",
      (s, d) => Multimodal.videoRoundTrip(T.documents(s, d))
        .orderBy("asset_id", "frame_idx"),
      Some("""SELECT doc_id AS asset_id,
                     k.range AS frame_idx,
                     CAST((doc_id + k.range) % 9 + 4 AS INT) AS dec_width,
                     CAST((doc_id + 2*k.range) % 7 + 4 AS INT) AS dec_height
              FROM documents, range(5) k
              WHERE doc_id % 3 = 2 AND k.range < doc_id % 4 + 2
              ORDER BY 1, 2""")),

    // Streaming dedup-at-ingest as a REAL stateful stream:
    // dropDuplicatesWithinWatermark keyed on (user_id, event_type), state
    // bounded by the 2 h watermark horizon instead of growing with the
    // corpus — the exact-dedup-on-an-ingest-feed pattern of a training
    // pipeline (batch twins: x4 exact-hash dedup, j4 union+distinct).
    // Over a single AvailableNow micro-batch (one source file) no state
    // expires mid-run, so exactly one row per distinct key is emitted;
    // the survivor's other columns follow state-store input order, hence
    // the query projects the key columns only, which makes the output
    // the distinct key set — deterministic and DuckDB-oracled. 10 000
    // events → 750 surviving keys on the test corpus, so the drop path
    // does real work.
    QueryDef(
      "z18_stream_dedup",
      (s, d) => EventStream.runDedupOnce(s, d,
          queryName = s"graft_dedup_${graft.etl.ScaleUtils.pathTag(d)}",
          keys = Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
        .orderBy("user_id", "event_type"),
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY 1, 2""")),

    // Ordered funnel (view → click → purchase within 7 days): the
    // canonical event-sequence operator (ClickHouse windowFunnel, Amplitude
    // funnels). Semantics: t1 = user's earliest 'view'; t2 = earliest
    // 'click' strictly after t1; t3 = earliest 'purchase' strictly after
    // t2; step k counts users whose tk exists with tk − t1 ≤ 7 d. The
    // greedy min-after-previous chain is computed as three whole-partition
    // window mins over ONE hash shuffle on user_id (each min references
    // the previous stage's column, constant within the partition — no
    // sort, no join, no per-user event gather), then a per-user roll-up
    // reusing the same partitioning and a 3-row stack. Scale shape: the
    // single natural-key shuffle + O(1) state per user is the layout a
    // 100 TB event log needs; nothing is ordered globally.
    // All time arithmetic is exact integer micros (see readEvents).
    QueryDef(
      "z19_funnel",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
        val w = Window.partitionBy("user_id")
        val staged = e
          .withColumn("t1",
            min(when(col("event_type") === "view", col("us"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("us") > col("t1"),
              col("us"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("us") > col("t2"),
              col("us"))).over(w))
        funnelRollup(staged.groupBy("user_id")
          .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3")))
      },
      Some(FunnelOracle)),

    // Weekly cohort retention: cohort = date of the user's first event;
    // week_offset = whole weeks since that first event (rolling weeks
    // anchored per user, exact integer-micros `div` — no calendar/tz
    // boundary semantics to disagree on across engines); a user is
    // retained in week k if any event lands there. Layout: the same
    // single user_id window shuffle as z5/z19 stamps first_us, then one
    // keyed (cohort, week) exact distinct-count — Spark plans it as the
    // standard two-level expand/partial-agg, no driver state — and the
    // week-0 denominator comes from a window over the tiny post-agg
    // frame (≤ cohorts × weeks rows), not a re-scan. Scale shape: both
    // shuffles are on natural keys; the corpus is touched exactly once.
    QueryDef(
      "z20_retention",
      (s, d) => {
        val e = EventStream.readEvents(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id")
        retentionRollup(e.withColumn("first_us", min("us").over(w))
          .select(col("user_id"),
            to_date(timestamp_micros(col("first_us"))).as("cohort"),
            expr(s"(us - first_us) div $RetentionWeekUs")
              .as("week_offset")))
      },
      Some(RetentionOracle)),

    // The STREAMING twin of z19: the same ordered funnel computed by a
    // per-user mapGroupsWithState state machine over a real micro-batch
    // execution — three longs of state per user, FINALIZED (closed
    // tombstone, r14 — never evicted, so re-entry cannot re-anchor) at
    // t1 + window, past which the windowed counts are final. Update-mode
    // re-emissions carry a MONOTONE triple whose fields never change
    // once set, so the per-user reduce is a plain max() aggregation; the
    // 3-row roll-up and the DuckDB oracle are shared with z19 verbatim,
    // pinning stream ≡ batch through the gate. Exact under per-user
    // in-order delivery (see EventStream.funnelChain's contract note).
    QueryDef(
      "z21_stream_funnel",
      (s, d) => funnelRollup(
        EventStream.runFunnelOnce(s, d, FunnelWindowUs,
            queryName = s"graft_funnel_${graft.etl.ScaleUtils.pathTag(d)}")
          .groupBy("user_id")
          .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))),
      Some(FunnelOracle)),

    // The STREAMING twin of z20: cohort retention from an append-only
    // flatMapGroupsWithState stream — two longs of state per user (the
    // first-event anchor + a bitmask of week offsets already emitted),
    // each (user, week) hit emitted exactly once across the stream's
    // lifetime, so the downstream roll-up is the SAME retentionRollup
    // the batch arm uses, with no dedupe step. Oracle shared with z20
    // verbatim, pinning stream ≡ batch through the gate. Same in-order
    // delivery contract as z21 (EventStream.retentionHits).
    QueryDef(
      "z22_stream_retention",
      (s, d) => retentionRollup(
        EventStream.runRetentionOnce(s, d, RetentionWeekUs,
            queryName = s"graft_retention_${graft.etl.ScaleUtils.pathTag(d)}")
          .select(col("user_id"),
            to_date(timestamp_micros(col("first_us"))).as("cohort"),
            col("week_offset"))),
      Some(RetentionOracle)),

    // Streaming HLL distinct-user sketch per event type (z23): the
    // ORDER-ROBUST member of the streaming family, and the sketch
    // family's streaming face. The whole stateful computation is one
    // DECLARATIVE streaming aggregation — groupBy(event_type, bkt)
    // .max(rho) — so Spark partial-aggregates map-side (each micro-
    // batch ships at most types × 256 register rows into the state
    // store, never the event volume) and state is BOUNDED BY DESIGN at
    // one long per (type, bucket): no watermark, no eviction, no
    // timeout needed, ever. Because max is commutative and idempotent,
    // the result is IDENTICAL under any delivery order, any batch
    // split, and any replay — the exact opposite contract to the
    // funnel/retention state machines (which need per-user in-order
    // delivery and carry breach counters for it): this is the shape to
    // reach for when a streaming metric can tolerate a sketch.
    // Update-mode re-emissions are folded by re-taking max — the same
    // idempotence again. The estimate arithmetic and the DuckDB oracle
    // CTEs are SHARED with x34 (TextOps.hllEstimate/hllOracleCtes), so
    // the two sketches can never drift; the exact-distinct control arm
    // rides along batch-side like x34's.
    QueryDef(
      "z23_stream_hll",
      (s, d) => {
        val regs = TextOps.hllBktRho(
          EventStream.eventsStream(s, d)
            .select(col("event_type"),
              graft.functions.PolyHash64
                .polyhash64(col("user_id").cast("string")).as("h")),
          "event_type")
          .groupBy("event_type", "bkt").agg(max("rho").as("rmax"))
        val emitted = EventStream.runUpdateAggOnce(s, regs,
          queryName = s"graft_hll_${graft.etl.ScaleUtils.pathTag(d)}")
        val est = TextOps.hllEstimate(
          emitted.groupBy("event_type", "bkt").agg(max("rmax").as("rmax")),
          "event_type")
        val exact = EventStream.readEvents(s, d)
          .groupBy("event_type")
          .agg(countDistinct("user_id").as("n_exact"))
        exact.join(est, Seq("event_type"))
          .select(col("event_type"), col("n_exact"), col("n_hll"),
            round((col("n_hll") - col("n_exact")) / col("n_exact") * 100, 2)
              .as("err_pct"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH tok AS (SELECT event_type,
           |         ${TextOps.sqlToSigned(TextOps.polySqlUnsigned(
                "CAST(user_id AS VARCHAR)"))} AS h
           |       FROM events),
           |${TextOps.hllOracleCtes("event_type")},
           |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
           |       FROM events GROUP BY 1)
           |SELECT ex.event_type, n_exact, n_hll,
           |       round((n_hll - n_exact) / n_exact * 100, 2) AS err_pct
           |FROM ex JOIN hll USING (event_type)
           |ORDER BY event_type""".stripMargin)),

    // Streaming count-min heavy hitters (z24): per-user event counts
    // estimated from the d×w CMS, probed for the top-10 most active
    // users — the classic "heavy hitters on a live stream" query, and
    // the FREQUENCY member of the streaming sketch pair (z23 counts
    // distinct; z24 counts occurrences). Same shape as z23: the whole
    // stateful computation is one declarative streaming aggregation —
    // groupBy(rw, cl).count() — map-side partial counts, state bounded
    // by design at d×w = 32 768 longs total, no watermark/eviction.
    // Per-cell counts are MONOTONE nondecreasing, so update-mode
    // re-emissions fold with max() (the latest emission per cell wins)
    // — and counting is order-free, so like z23 the result is exact
    // under any delivery order or batch split; replays are the one
    // hazard (sum-family algebra, CmsSpec) and the AvailableNow commit
    // log rules them out. Hash family + probe arithmetic shared with
    // x35 (TextOps.cmsCells), oracle replays it bit-for-bit.
    QueryDef(
      "z24_stream_cms",
      (s, d) => {
        val regs = cmsCellCounts(EventStream.eventsStream(s, d))
        val emitted = EventStream.runUpdateAggOnce(s, regs,
          queryName = s"graft_cms_${graft.etl.ScaleUtils.pathTag(d)}")
        val sketch = emitted.groupBy("rw", "cl").agg(max("cnt").as("cnt"))
        val top = EventStream.readEvents(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("user_id")).limit(10)
        val probes = top
          .withColumn("h", graft.functions.PolyHash64
            .polyhash64(col("user_id").cast("string")))
          .select(col("user_id"), col("n_exact"), TextOps.cmsCells.as("rc"))
          .select(col("user_id"), col("n_exact"),
            col("rc.rw").as("rw"), col("rc.cl").as("cl"))
        probes.join(sketch, Seq("rw", "cl"))
          .groupBy("user_id", "n_exact").agg(min("cnt").as("n_cms"))
          .select(col("user_id"), col("n_exact"), col("n_cms"),
            (col("n_cms") - col("n_exact")).as("overest"))
          .orderBy(col("n_exact").desc, col("user_id"))
      },
      Some(
        s"""WITH tok AS (SELECT user_id,
           |         ${TextOps.sqlToSigned(TextOps.polySqlUnsigned(
                "CAST(user_id AS VARCHAR)"))} AS h
           |       FROM events),
           |${TextOps.cmsOracleCtes("user_id")},
           |ex AS (SELECT user_id, count(*) AS n_exact FROM events
           |       GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT 10),
           |${TextOps.cmsProbeCte("user_id")},
           |cms AS (SELECT user_id, n_exact, min(cnt) AS n_cms
           |        FROM probes JOIN sketch USING (rw, cl)
           |        GROUP BY 1, 2)
           |SELECT user_id, n_exact, n_cms, n_cms - n_exact AS overest
           |FROM cms ORDER BY n_exact DESC, user_id""".stripMargin)),

    // Streaming histogram quantile sketch (z25): per-type value
    // percentiles from B fixed-width bins — completing the streaming
    // sketch trio (z23 HLL = distinct, z24 CMS = frequency, z25 =
    // QUANTILES, the live-latency-percentile query every event
    // pipeline runs). Same ORDER-ROBUST declarative shape: the whole
    // stateful computation is one streaming groupBy(event_type, bin)
    // .count() — map-side partial counts, state bounded BY DESIGN at
    // types × QBins rows (the bin index is clamped into [0, QBins-1],
    // so state cannot grow past the histogram no matter the values),
    // no watermark/eviction. Counting is order-free and per-cell
    // counts are MONOTONE, so update-mode re-emissions fold with max()
    // and the result is exact under any delivery order or batch split
    // (replays: sum-family algebra, same contract as z24 — the
    // AvailableNow commit log rules them out, and the z24 JDBC-upsert
    // terminal trick applies verbatim). The quantile finish reads only
    // the sketch: smallest bin whose cumulative count reaches
    // ceil(p·n); estimate = the bin's LOWER edge, so the error is
    // one-sided in [0, QWidth) — pinned against the exact ceil(p·n)
    // order statistic (the control arm a 100 TB run drops). QWidth is
    // a POWER OF TWO (0.25), so value/QWidth is an exact mantissa
    // shift and floor() is bit-identical on both engines; all
    // geometry interpolates from the two constants (the x35/z24
    // lesson — no baked literals).
    QueryDef(
      "z25_stream_quantiles",
      (s, d) => {
        val regs = quantBinCounts(EventStream.eventsStream(s, d))
        val emitted = EventStream.runUpdateAggOnce(s, regs,
          queryName = s"graft_quant_${graft.etl.ScaleUtils.pathTag(d)}")
        val sketch = emitted.groupBy("event_type", "bin")
          .agg(max("cnt").as("cnt"))
        // finish + control via the SHARED quantile skeleton (TextOps
        // histQuantileBins/exactOrderStats — one code path with x36,
        // the batch twin, so the two faces can never drift)
        val ps = Seq("50" -> 0.5, "90" -> 0.9, "99" -> 0.99)
        val est = TextOps.histQuantileBins(sketch, "event_type", ps)
        val exact = TextOps.exactOrderStats(
          EventStream.readEvents(s, d)
            .select(col("event_type"), col("value").as("v")),
          "event_type", ps)
        def cols(b: String, x: String, tag: String) = Seq(
          round(col(b) * QWidth, 2).as(s"p${tag}_est"),
          col(x).as(s"p${tag}_exact"),
          round(col(x) - col(b) * QWidth, 4).as(s"p${tag}_err"))
        est.join(exact, Seq("event_type"))
          .select(col("event_type") +: col("n") +:
            (cols("b50", "x50", "50") ++ cols("b90", "x90", "90") ++
              cols("b99", "x99", "99")): _*)
          .orderBy("event_type")
      },
      Some(
        s"""WITH hb AS (SELECT event_type,
           |         CAST(least(greatest(floor(value / $QWidth), 0),
           |           ${QBins - 1}) AS BIGINT) AS bin
           |       FROM events),
           |hv AS (SELECT event_type, value AS v FROM events),
           |${TextOps.histQuantileOracleCtes("event_type",
                Seq("50" -> 0.5, "90" -> 0.9, "99" -> 0.99))}
           |SELECT event_type, n,
           |       round(b50 * $QWidth, 2) AS p50_est, x50 AS p50_exact,
           |       round(x50 - b50 * $QWidth, 4) AS p50_err,
           |       round(b90 * $QWidth, 2) AS p90_est, x90 AS p90_exact,
           |       round(x90 - b90 * $QWidth, 4) AS p90_err,
           |       round(b99 * $QWidth, 2) AS p99_est, x99 AS p99_exact,
           |       round(x99 - b99 * $QWidth, 4) AS p99_err
           |FROM est JOIN ex USING (event_type)
           |ORDER BY event_type""".stripMargin)),

    // Windowed streaming HLL (z26): distinct users per CLOSED hour
    // window per event type — the metric where exact streaming
    // distinct-count state explodes (every user id per open window in
    // the store) and the register sketch caps it BY DESIGN at
    // open-windows × types × 256 longs, with the watermark EVICTING
    // each window's registers the moment it closes. Composition of two
    // proven pieces, nothing new invented: z8's append-mode window
    // closure (a window emits exactly once when the watermark — max
    // event ms − 2 h — passes its end; trailing windows stay open and
    // unemitted, and the oracle replays exactly that predicate) and
    // z23's order-robust register aggregation (max is commutative +
    // idempotent; the estimate arithmetic and oracle CTEs are the
    // SHARED hllEstimate/hllOracleCtes skeleton, now keyed on
    // (window, type)). The exact per-window countDistinct control arm
    // rides along batch-side like z23's — the arm a production run
    // drops. Output window starts are epoch micros (s_us convention).
    QueryDef(
      "z26_stream_windowed_hll",
      (s, d) => {
        val regs = TextOps.hllBktRho(
          EventStream.eventsStream(s, d)
            .withWatermark("ts", "2 hours")
            .select(col("ts"), col("event_type"),
              graft.functions.PolyHash64
                .polyhash64(col("user_id").cast("string")).as("h")),
          "ts", "event_type")
          .groupBy(window(col("ts"), "1 hour").as("w"),
            col("event_type"), col("bkt"))
          .agg(max("rho").as("rmax"))
        val emitted = EventStream.runAppendAggOnce(s, regs,
          queryName = s"graft_whll_${graft.etl.ScaleUtils.pathTag(d)}")
        val est = TextOps.hllEstimate(
          emitted.select(unix_micros(col("w.start")).as("ws"),
            col("event_type"), col("bkt"), col("rmax")),
          "ws", "event_type")
        // r15 optimization (guide §1.2: don't compute what you throw
        // away): the engine-side closure filter that mirrored the
        // oracle's `ws + 1h <= wm` predicate was REDUNDANT with the
        // inner join below — `est` holds exactly the append-mode
        // emitted (= watermark-closed) windows, the same equivalence
        // z8 has leaned on since it shipped (its engine side carries
        // no closure filter at all; only the oracle replays the
        // predicate). Dropping the filter removes a second full scan
        // of events (the global max(ts) aggregation) plus a broadcast
        // build per run; the oracle is unchanged and still applies
        // the predicate independently.
        val exact = EventStream.readEvents(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(countDistinct("user_id").as("n_exact"))
          .select(unix_micros(col("w.start")).as("ws"), col("event_type"),
            col("n_exact"))
        exact.join(est, Seq("ws", "event_type"))
          .select(col("ws"), col("event_type"), col("n_exact"),
            col("n_hll"),
            round((col("n_hll") - col("n_exact")) / col("n_exact") * 100, 2)
              .as("err_pct"))
          .orderBy("ws", "event_type")
      },
      Some(
        s"""WITH wm AS (SELECT epoch_ns(max(ts)) // 1000000 - 7200000
           |             AS wm_ms FROM events),
           |tok AS (SELECT epoch_ns(date_trunc('hour', ts)) // 1000 AS ws,
           |         event_type,
           |         ${TextOps.sqlToSigned(TextOps.polySqlUnsigned(
                "CAST(user_id AS VARCHAR)"))} AS h
           |       FROM events),
           |${TextOps.hllOracleCtes("ws", "event_type")},
           |ex AS (SELECT epoch_ns(date_trunc('hour', ts)) // 1000 AS ws,
           |         event_type, count(DISTINCT user_id) AS n_exact
           |       FROM events GROUP BY 1, 2)
           |SELECT ws, event_type, n_exact, n_hll,
           |       round((n_hll - n_exact) / n_exact * 100, 2) AS err_pct
           |FROM ex JOIN hll USING (ws, event_type), wm
           |WHERE ws // 1000 + 3600000 <= wm.wm_ms
           |ORDER BY ws, event_type""".stripMargin))
  )
}
