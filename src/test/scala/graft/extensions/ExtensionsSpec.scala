package graft.extensions

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  describe("Multimodal plumbing (binary columns + typed metadata)") {
    lazy val assets = Multimodal.syntheticAssets(
      spark.read.parquet(s"$sf/documents.parquet"))

    it("builds the asset schema with binary content + metadata struct") {
      assert(assets.schema("content").dataType.typeName == "binary")
      assert(assets.count() > 0)
      val m = assets.select("modality").distinct().collect()
        .map(_.getString(0)).toSet
      assert(m == Set("image", "audio", "video"))
    }

    it("extracts unit-norm float features in partition blocks") {
      val f = Multimodal.withFeatures(assets, dim = 16)
      val rows = f.select("feature").collect()
      assert(rows.forall(_.getSeq[Float](0).length == 16))
      val norms = rows.map(r =>
        math.sqrt(r.getSeq[Float](0).map(x => x * x).sum))
      assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
      // deterministic
      val again = Multimodal.withFeatures(assets, dim = 16)
        .select("feature").collect()
      assert(rows.map(_.getSeq[Float](0)).toSeq ==
        again.map(_.getSeq[Float](0)).toSeq)
    }

    it("resizes metadata and samples video frames") {
      val resized = Multimodal.resizeImages(assets, maxSide = 32)
      val dims = resized.select(
        greatest(col("meta.width"), col("meta.height"))).collect()
      assert(dims.forall(_.getInt(0) <= 32))
      val frames = Multimodal.sampleFrames(assets, everyMs = 500)
      assert(frames.count() > assets.filter(col("modality") === "video").count())
    }

    it("profiles modalities") {
      val p = Multimodal.modalityProfile(assets).collect()
      assert(p.length == 3 && p.forall(_.getLong(1) > 0))
    }
  }

  describe("Structured Streaming over events") {
    it("windowed counts with watermark match the batch equivalent") {
      val streamed = EventStream.runWindowedOnce(spark, sf, "t_counts")
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
      val batch = EventStream.readEvents(spark, sf)
        .groupBy(window(col("ts"), "1 hour").as("window"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
      assert(streamed.count() > 0)
      assert(streamed.except(batch).count() == 0)
      assert(batch.except(streamed).count() == 0)
    }

    it("streaming dedup-at-ingest equals batch distinct on the key") {
      val deduped = EventStream.runDedupOnce(spark, sf, "t_dedup")
        .select("user_id", "event_type", "ts")
      val batch = EventStream.readEvents(spark, sf)
        .select("user_id", "event_type", "ts").distinct()
      // within one AvailableNow pass every duplicate falls inside the
      // watermark horizon, so streaming dedup == batch distinct
      assert(deduped.count() == batch.count())
      assert(deduped.except(batch).count() == 0)
    }

    it("sessionizes per-user events with custom state") {
      import spark.implicits._
      val evs = EventStream.readEvents(spark, sf)
        .select(col("user_id"), col("ts"), col("event_type"))
        .as[EventStream.SessionEvent]
      val sessions = EventStream.sessionize(evs, gapMs = 3600L * 1000)
        .collect()
      assert(sessions.nonEmpty)
      assert(sessions.forall(_.n_events > 0))
    }
  }
}
