package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables => T}
import graft.multimodal.Multimodal
import graft.streaming.EventStream

/** Multimodal and event/streaming operators exposed through the driver
  * contract. */
object ExtensionOps {

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

    // True Structured Streaming execution (AvailableNow → memory sink),
    // result must equal the batch rollup; rows-only by nature.
    QueryDef(
      "z4_stream_windowed",
      (s, d) => EventStream.runWindowedOnce(s, d,
          queryName = s"graft_stream_${math.abs(d.hashCode)}")
        .select(col("window.start").as("ws"), col("event_type"), col("n"),
          round(col("total_value"), 4).as("total_value"))
        .orderBy("ws", "event_type"),
      None)
  )
}
