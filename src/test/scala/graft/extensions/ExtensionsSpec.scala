package graft.extensions

import graft.{SparkEntry, SparkSpec}
import graft.multimodal.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.Row
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

    it("decodes a REAL byte-array PNG to exact width/height/mean-intensity") {
      // golden: an 8x6 gradient image, PNG-encoded in-memory (lossless,
      // so the decoded luma must match the painted pixels bit-for-bit)
      val (w, h) = (8, 6)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var expected = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val r = x * 30 % 256; val g = y * 40 % 256; val b = (x + y) * 10 % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        expected += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
      }
      expected /= (w * h)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val png = bos.toByteArray
      // direct codec golden check
      val Some((dw, dh, luma)) = Multimodal.ImageCodec.decode(png)
      assert(dw == w && dh == h)
      assert(math.abs(luma - expected) < 1e-12, s"luma $luma != $expected")
      // through the distributed operator: real bytes in a binary cell
      val df = spark.createDataFrame(
        java.util.Arrays.asList(
          Row(1L, "image", png, Row("image/png", w, h, 0, 0L))),
        Multimodal.assetSchema)
      val out = Multimodal.decodeImages(df).collect()(0)
      assert(out.getAs[Int]("dec_width") == w)
      assert(out.getAs[Int]("dec_height") == h)
      assert(math.abs(out.getAs[Double]("mean_intensity") - expected) < 1e-12)
    }

    it("decodes a REAL byte-array WAV to exact rate/duration/RMS") {
      // golden: 0.25 s of a 440 Hz sine at 8 kHz mono, 16-bit PCM,
      // WAV-encoded in-memory via the JDK writer (lossless container,
      // so decoded RMS must match the quantized samples bit-for-bit)
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val rate = 8000
      val n = rate / 4
      val pcm = new Array[Byte](n * 2)
      var sumSq = 0.0
      for (i <- 0 until n) {
        val s = math.round(0.5 * math.sin(2 * math.Pi * 440 * i / rate)
          * 32767).toShort
        sumSq += (s / 32768.0) * (s / 32768.0)
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val expectedRms = math.sqrt(sumSq / n)
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n),
        AudioFileFormat.Type.WAVE, bos)
      val wav = bos.toByteArray
      // direct codec golden check
      val Some((dr, dc, dur, rms)) = Multimodal.AudioCodec.decode(wav)
      assert(dr == rate && dc == 1 && dur == 250L)
      assert(math.abs(rms - expectedRms) < 1e-12, s"rms $rms != $expectedRms")
      // through the distributed operator: real bytes in a binary cell
      val df = spark.createDataFrame(
        java.util.Arrays.asList(
          Row(1L, "audio", wav, Row("audio/wav", 0, 0, rate, 250L))),
        Multimodal.assetSchema)
      val out = Multimodal.decodeAudio(df).collect()(0)
      assert(out.getAs[Int]("dec_sample_rate") == rate)
      assert(out.getAs[Int]("dec_channels") == 1)
      assert(out.getAs[Long]("dec_duration_ms") == 250L)
      assert(math.abs(out.getAs[Double]("rms_amplitude") - expectedRms) < 1e-12)
      // non-audio bytes: codec declines, operator keeps stub semantics
      val text = "not audio".getBytes("UTF-8")
      assert(Multimodal.AudioCodec.decode(text).isEmpty)
      val viaOp = Multimodal.decodeAudio(assets.limit(5)).collect()
      viaOp.foreach { r =>
        val stub = Multimodal.StubCodec.decodeAudio(
          r.getAs[Array[Byte]]("content"),
          r.getAs[Row]("meta").getAs[Int]("sample_rate"),
          r.getAs[Row]("meta").getAs[Long]("duration_ms"))
        assert(r.getAs[Int]("dec_sample_rate") == stub._1)
        assert(r.getAs[Long]("dec_duration_ms") == stub._3)
        assert(math.abs(r.getAs[Double]("rms_amplitude") - stub._4) < 1e-12)
      }
    }

    it("decodes JPEG bytes and falls back to the stub on non-image cells") {
      val img = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16) img.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val Some((jw, jh, jl)) = Multimodal.ImageCodec.decode(bos.toByteArray)
      // JPEG is lossy: dims exact, uniform-gray luma within 2/255
      assert(jw == 16 && jh == 12)
      assert(math.abs(jl - 128.0 / 255.0) < 2.0 / 255.0)
      // non-image bytes (the synthetic corpus): codec declines, operator
      // keeps the documented deterministic stub semantics
      val text = "not an image".getBytes("UTF-8")
      assert(Multimodal.ImageCodec.decode(text).isEmpty)
      val viaOp = Multimodal.decodeImages(assets.limit(5)).collect()
      viaOp.foreach { r =>
        val stub = Multimodal.StubCodec.decodeImage(
          r.getAs[Array[Byte]]("content"),
          r.getAs[Row]("meta").getAs[Int]("width"),
          r.getAs[Row]("meta").getAs[Int]("height"))
        assert(r.getAs[Int]("dec_width") == stub._1)
        assert(r.getAs[Int]("dec_height") == stub._2)
        assert(math.abs(r.getAs[Double]("mean_intensity") - stub._3) < 1e-12)
      }
    }

    it("decodes a REAL MJPEG stream frame-by-frame and falls back to " +
        "the stub on non-video cells") {
      // golden: three grayscale gradient frames of DIFFERENT dims,
      // JPEG-encoded and concatenated — a real MJPEG stream
      val dims = Seq((16, 12), (8, 10), (20, 6))
      val bos = new java.io.ByteArrayOutputStream()
      val painted = dims.zipWithIndex.map { case ((w, h), k) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var sum = 0.0
        for (y <- 0 until h; x <- 0 until w) {
          val v = (x * 11 + y * 17 + k * 40) % 256
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          sum += v / 255.0
        }
        javax.imageio.ImageIO.write(img, "jpg", bos)
        sum / (w * h)
      }
      val mjpeg = bos.toByteArray
      // marker scan finds exactly the frame boundaries (0xFF bytes in
      // entropy-coded data are FF00-stuffed, so no false EOI splits)
      val slices = Multimodal.VideoCodec.splitFrames(mjpeg)
      assert(slices.size == 3)
      assert(slices.map(_.length).sum == mjpeg.length,
        "frames must tile the stream exactly (writer emits no padding)")
      val Some(frames) = Multimodal.VideoCodec.decodeFrames(mjpeg)
      assert(frames.map(f => (f._1, f._2)) == dims)
      // JPEG is lossy: grayscale mean luma within 4/255 of the paint
      frames.zip(painted).foreach { case ((_, _, luma), exp) =>
        assert(math.abs(luma - exp) < 4.0 / 255.0, s"luma $luma vs $exp")
      }
      // through the distributed operator: real bytes in a binary cell
      val df = spark.createDataFrame(
        java.util.Arrays.asList(
          Row(1L, "video", mjpeg, Row("video/x-motion-jpeg", 16, 12, 0, 0L))),
        Multimodal.assetSchema)
      val out = Multimodal.decodeVideo(df).collect()(0)
      assert(out.getAs[Int]("n_frames") == 3)
      assert(out.getAs[Int]("f0_width") == 16)
      assert(out.getAs[Int]("f0_height") == 12)
      // non-video bytes: codec declines, operator keeps stub semantics
      // (n_frames = 0 marks the undecodable arm loudly)
      assert(Multimodal.VideoCodec
        .decodeFrames("not a video".getBytes("UTF-8")).isEmpty)
      val viaOp = Multimodal.decodeVideo(assets.limit(5)).collect()
      viaOp.foreach { r =>
        val stub = Multimodal.StubCodec.decodeImage(
          r.getAs[Array[Byte]]("content"),
          r.getAs[Row]("meta").getAs[Int]("width"),
          r.getAs[Row]("meta").getAs[Int]("height"))
        assert(r.getAs[Int]("n_frames") == 0)
        assert(r.getAs[Int]("f0_width") == stub._1)
        assert(math.abs(r.getAs[Double]("mean_luma") - stub._3) < 1e-12)
      }
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

    it("streams a DIRECTORY-layout events table identically to the " +
       "single-file layout") {
      // The driver test data is one parquet FILE under sfDir; any
      // Spark-written copy (the production layout) is a DIRECTORY of
      // part files, where the old leaf-name glob silently matched zero
      // files and every stream read 0 rows (found by the x10/x100
      // blow-up probe). Re-write the same events as a directory and
      // assert the streamed result is identical.
      val dir = java.nio.file.Files
        .createTempDirectory("graft_events_dirlayout").toString
      try {
        EventStream.readEvents(spark, sf).write.mode("overwrite")
          .parquet(s"$dir/events.parquet")
        val fromDir = EventStream.runWindowedOnce(spark, dir, "t_counts_dir")
          .select(col("window.start").as("ws"), col("event_type"), col("n"))
        val fromFile = EventStream.runWindowedOnce(spark, sf, "t_counts_f")
          .select(col("window.start").as("ws"), col("event_type"), col("n"))
        assert(fromDir.count() > 0)
        assert(fromDir.except(fromFile).count() == 0)
        assert(fromFile.except(fromDir).count() == 0)
      } finally {
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dir))
      }
    }

    it("an append stream that closes nothing returns an empty frame " +
       "with the right schema (file-sink zero-row fallback)") {
      // all events inside the watermark horizon → every session stays
      // open → the parquet sink commits zero part files; the runner
      // must fall back to an empty frame with the output schema rather
      // than fail schema inference on an empty directory
      val dir = java.nio.file.Files
        .createTempDirectory("graft_events_empty").toString
      try {
        EventStream.readEvents(spark, sf).limit(3)
          .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        val out = EventStream.runSessionWindowOnce(spark, dir, "t_zero_rows")
        assert(out.count() == 0)
        assert(out.columns.toSeq == Seq("user_id", "s_us", "n"))
      } finally {
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dir))
      }
    }

    it("append mode emits exactly the watermark-closed windows (z8)") {
      val appended = EventStream.runWindowedAppendOnce(spark, sf, "t_append")
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"))
      val batch = EventStream.readEvents(spark, sf)
        .groupBy(window(col("ts"), "1 hour").as("window"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"))
      // Spark's watermark is max event time (whole ms) - 2 h; append
      // emits + evicts windows with end <= watermark, retaining the
      // trailing horizon as open state
      val wmMs = EventStream.readEvents(spark, sf)
        .agg((max(unix_micros(col("ts"))) / 1000).cast("long").as("ms"))
        .head().getLong(0) - 2 * 3600 * 1000
      val closed = batch.filter(
        (unix_micros(col("we")) / 1000).cast("long") <= wmMs)
      assert(appended.count() > 0, "no closed windows emitted")
      assert(appended.count() < batch.count(),
        "trailing open windows must be withheld")
      assert(appended.except(closed).count() == 0)
      assert(closed.except(appended).count() == 0)
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

    it("pair-keyed streaming dedup (z18) emits exactly the distinct key set") {
      val deduped = EventStream.runDedupOnce(spark, sf, "t_dedup_pair",
          keys = Seq("user_id", "event_type"))
        .select("user_id", "event_type")
      val events = EventStream.readEvents(spark, sf)
      val batch = events.select("user_id", "event_type").distinct()
      // coarser key than the row → the drop path does real work
      assert(deduped.count() < events.count(),
        "pair key must actually drop duplicate arrivals")
      assert(deduped.count() == batch.count())
      assert(deduped.except(batch).count() == 0)
      assert(batch.except(deduped).count() == 0)
    }

    it("stream-stream interval join equals the batch inequality join") {
      val streamed = EventStream.runIntervalJoinOnce(spark, sf, "t_join")
        .select("purchase_id", "click_id")
      val e = EventStream.readEvents(spark, sf)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
      val batch = p.join(c,
          expr("""p_user = c_user AND
                  c_ts <= p_ts AND c_ts > p_ts - INTERVAL 6 HOURS"""))
        .select("purchase_id", "click_id")
      // within one AvailableNow pass nothing is late, so the streaming
      // interval join must emit exactly the batch join's pairs
      assert(streamed.count() > 0)
      assert(streamed.except(batch).count() == 0)
      assert(batch.except(streamed).count() == 0)
    }

    it("stateful streams run unchanged on the RocksDB state store") {
      // the 100 TB state backend: HDFS-backed stores keep state on the
      // executor heap (fine for small state); RocksDB spills to local
      // disk with incremental checkpointing — the provider a real
      // deployment runs sessionization on. Same query, same results:
      // the provider is pure infrastructure, and this pins that no
      // graft state shape depends on the default provider's semantics.
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val rocks = EventStream.runSessionizeAllOnce(spark, sf,
            gapMs = 6L * 3600 * 1000, queryName = "t_rocks")
        val default = SparkEntry.queries("z15_stream_sessions_all")(spark, sf)
        assert(rocks.count() > 0)
        assert(rocks.except(default).count() == 0)
        assert(default.except(rocks).count() == 0)
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    it("evicts idle users' session state via event-time timeout") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ev(u: Long, ms: Long) = EventStream.SessionEvent(
        u, new java.sql.Timestamp(ms), "view")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.SessionEvent]
      val q = EventStream.sessionize(
          mem.toDS().withWatermark("ts", "0 seconds"), gapMs = 1000)
        .writeStream.format("memory").queryName("t_evict")
        .outputMode("update").start()
      try {
        // batch 1: users 1 and 2 both active at t=1s
        mem.addData(ev(1, 1000), ev(2, 1000))
        q.processAllAvailable()
        // batch 2: only user 2 advances event time far past user 1's gap
        // (watermark is still batch 1's at planning time)
        mem.addData(ev(2, 100000))
        q.processAllAvailable()
        // batch 3: watermark is now 100s >> user 1's last+gap=2s, so the
        // timeout fires: user 1's session closes and its state is dropped
        mem.addData(ev(2, 200000))
        q.processAllAvailable()
        val out = spark.table("t_evict")
          .as[EventStream.SessionOut].collect()
        assert(out.exists(o => o.user_id == 1 && o.closed && o.n_events == 1),
          s"user 1's session must close on timeout: ${out.mkString(", ")}")
        // state is bounded: only user 2 (still active) remains
        val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
        assert(stateRows == 1,
          s"expected 1 live state row after eviction, got $stateRows")
      } finally q.stop()
    }

    it("recovers z15 sessionization across a checkpoint restart " +
        "(exactly-once file sink, RocksDB state)") {
      // The deployment claim behind every streaming query: state +
      // sink survive a stop/restart with no loss and no duplicates.
      // Drive: split the corpus in two by event time, run the z15
      // sessionizer to completion on half 1 (real checkpoint dir, real
      // parquet sink), then "restart" — a brand-new query object over
      // the same checkpoint — after half 2 lands. The combined sink
      // must equal the single-run z15 result exactly: sessions closed
      // by run 1's watermark stay closed (half 2 is strictly later, so
      // a >8 h-old session can never reopen across a 6 h gap), open
      // state is restored from the checkpoint, and the file sink's
      // _spark_metadata commit log dedups any replayed batch.
      import org.apache.spark.sql.streaming.Trigger
      val tmp = java.nio.file.Files.createTempDirectory("graft-restart")
      val srcDir = tmp.resolve("src").toString
      val ckpt = tmp.resolve("ckpt").toString
      val outDir = tmp.resolve("out").toString
      val gapMs = 6L * 3600 * 1000
      val events = EventStream.readEvents(spark, sf)
        .select(col("user_id"), col("ts"), col("event_type"))
      // split at the median event time (approxQuantile needs a numeric
      // column, so cut on exact integer micros)
      val cut = events.select(unix_micros(col("ts")).as("us"))
        .stat.approxQuantile("us", Array(0.5), 0.0)(0)
      events.filter(unix_micros(col("ts")) <= cut).coalesce(1)
        .write.mode("append").parquet(srcDir)
      val schema = events.schema
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      def runToCompletion(): Unit = {
        import spark.implicits._
        val evs = spark.readStream.schema(schema).parquet(srcDir)
          .withWatermark("ts", "2 hours")
          .as[EventStream.SessionEvent]
        val q = EventStream.sessionizeAll(evs, gapMs).writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      try {
        runToCompletion() // run 1: half the corpus, checkpoint persists
        events.filter(unix_micros(col("ts")) > cut).coalesce(1)
          .write.mode("append").parquet(srcDir)
        runToCompletion() // run 2: fresh query, same checkpoint = restart
      } finally prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
      val restarted = spark.read.parquet(outDir)
      val single = graft.SparkEntry.queries("z15_stream_sessions_all")(
        spark, sf)
      assert(restarted.count() == single.count(),
        s"restart emitted ${restarted.count()} rows vs single-run " +
          s"${single.count()}")
      assert(restarted.except(single).count() == 0,
        "restarted run emitted rows the single run did not (duplicate " +
          "or corrupted session)")
      assert(single.except(restarted).count() == 0,
        "restarted run lost sessions the single run emitted")
    }

    it("pins the timeout firing boundary: armed-ts must be STRICTLY " +
        "below the watermark") {
      // FlatMapGroupsWithStateExec filters timed-out state with
      // `timeoutTimestamp < watermark` (strict). A session whose
      // last+gap exactly EQUALS the watermark therefore stays open —
      // the z15 oracle must use `l_ms + gap < wm`, not `<=`. This spec
      // pins the observed Spark behavior so the oracle convention is
      // evidence, not folklore.
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ev(u: Long, ms: Long) = EventStream.SessionEvent(
        u, new java.sql.Timestamp(ms), "view")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStream.SessionEvent]
      val q = EventStream.sessionizeAll(
          mem.toDS().withWatermark("ts", "0 seconds"), gapMs = 1000)
        .writeStream.format("memory").queryName("t_boundary")
        .outputMode("append").start()
      try {
        // batch 1: user 1's lone event at t=1000 ms arms its timeout at
        // last+gap = 2000 ms (watermark at arming is 0, no clamp)
        mem.addData(ev(1, 1000))
        q.processAllAvailable()
        // batch 2: user 2 advances max event time to exactly 2000 ms.
        // Spark evaluates timeouts against the EVICTION watermark — the
        // one updated by this very batch's data (post-3.4 watermark
        // split) — so equality is tested here: armed == 2000 == wm.
        mem.addData(ev(2, 2000))
        q.processAllAvailable()
        val atEq = spark.table("t_boundary")
          .as[EventStream.SessionRow].collect()
        assert(!atEq.exists(_.user_id == 1),
          s"armed == watermark must not fire: ${atEq.mkString(", ")}")
        // batch 3 advances the eviction watermark to 2001 > armed: now
        // it fires and the session emits exactly once
        mem.addData(ev(2, 2001))
        q.processAllAvailable()
        val after = spark.table("t_boundary")
          .as[EventStream.SessionRow].collect()
        assert(after.count(_.user_id == 1) == 1 &&
            after.exists(o => o.user_id == 1 && o.n_events == 1),
          s"armed < watermark must fire once: ${after.mkString(", ")}")
      } finally q.stop()
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

  describe("Temporal joins over events (z5/z6/z7)") {
    // raw (user, micros, type, id) tuples for brute-force references
    lazy val raw: Array[(Long, Long, String, Long)] =
      EventStream.readEvents(spark, sf)
        .select(col("user_id"), unix_micros(col("ts")), col("event_type"),
          col("event_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

    it("z5_sessionize matches a brute-force per-user gap scan") {
      val gapUs = 6L * 3600 * 1000000
      val expected = raw.groupBy(_._1).map { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head > gapUs) List(t) :: acc
          else (t :: acc.head) :: acc.tail
        }
        u -> (sessions.length.toLong, sessions.map(_.length).max.toLong)
      }
      val got = graft.SparkEntry.queries("z5_sessionize")(spark, sf)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
        .toMap
      assert(got.keySet == expected.keySet)
      expected.foreach { case (u, (nSess, maxLen)) =>
        assert(got(u)._1 == nSess, s"user $u sessions")
        assert(got(u)._2 == maxLen, s"user $u max session length")
      }
    }

    it("z6_asof_join matches a brute-force most-recent-prior-click scan") {
      val clicks = raw.filter(_._3 == "click")
        .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._4)).sortBy(_._1))
        .toMap
      val expected = raw.filter(_._3 == "purchase").flatMap { p =>
        clicks.getOrElse(p._1, Array.empty[(Long, Long)])
          .filter(_._1 <= p._2)
          .sortBy(_._1).lastOption
          .map(c => p._4 -> (c._2, (p._2 - c._1) / 1000000))
      }.toMap
      val got = graft.SparkEntry.queries("z6_asof_join")(spark, sf)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got == expected)
    }

    it("z7_range_join matches a brute-force windowed count") {
      val winUs = 6L * 3600 * 1000000
      val views = raw.filter(_._3 == "view").groupBy(_._1)
      val expected = raw.filter(_._3 == "error").map { e =>
        val n = views.getOrElse(e._1, Array.empty[(Long, Long, String, Long)])
          .count(v => v._2 <= e._2 && v._2 > e._2 - winUs)
        e._4 -> n.toLong
      }.toMap
      val got = graft.SparkEntry.queries("z7_range_join")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
      // the window must actually be exercised somewhere in the corpus
      assert(got.values.sum > 0, "range window matched nothing")
    }

    it("z19_funnel matches a brute-force greedy min-after-previous chain") {
      val winUs = 7L * 86400 * 1000000
      // greedy chain per user: earliest view, earliest click after it,
      // earliest purchase after that — exactly the query's semantics
      val chains = raw.groupBy(_._1).values.map { evs =>
        def firstAfter(tpe: String, after: Long): Option[Long] =
          evs.filter(e => e._3 == tpe && e._2 > after)
            .map(_._2).minOption
        val t1 = evs.filter(_._3 == "view").map(_._2).minOption
        val t2 = t1.flatMap(firstAfter("click", _))
        val t3 = t2.flatMap(firstAfter("purchase", _))
        (t1, t2, t3)
      }.toSeq
      val u1 = chains.count(_._1.isDefined).toLong
      val u2 = chains.count(c =>
        c._2.exists(t => t - c._1.get <= winUs)).toLong
      val u3 = chains.count(c =>
        c._3.exists(t => t - c._1.get <= winUs)).toLong
      val got = graft.SparkEntry.queries("z19_funnel")(spark, sf)
        .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      assert(got == Map(1 -> ("view", u1), 2 -> ("click", u2),
        3 -> ("purchase", u3)))
      // the funnel must narrow (strictly positive entry, monotone steps)
      assert(u1 > 0 && u1 >= u2 && u2 >= u3)
    }

    it("z21_stream_funnel reproduces the batch funnel through a real stream") {
      val batch = graft.SparkEntry.queries("z19_funnel")(spark, sf)
        .collect().toSeq
      val stream = graft.SparkEntry.queries("z21_stream_funnel")(spark, sf)
        .collect().toSeq
      assert(stream == batch)
      // and the stream actually did per-user stateful work: the sink
      // table holds at least one triple per funnel-entering user
      val entered = batch.head.getLong(2)
      assert(spark.table(s"graft_funnel_${graft.etl.ScaleUtils.pathTag(sf)}")
        .count() >= entered)
    }

    it("z22_stream_retention reproduces the batch retention through " +
        "an append-only stream") {
      val batch = graft.SparkEntry.queries("z20_retention")(spark, sf)
        .collect().toSeq
      val stream = graft.SparkEntry.queries("z22_stream_retention")(spark, sf)
        .collect().toSeq
      assert(stream == batch)
      // append-only contract: the sink holds each (user, week) hit
      // EXACTLY once — any duplicate would mean the bitmask state leaked
      val hits = spark.table(
        s"graft_retention_${graft.etl.ScaleUtils.pathTag(sf)}")
      assert(hits.count() ==
        hits.select("user_id", "week_offset").distinct().count())
    }

    it("z20_retention matches a brute-force per-user week bucketing") {
      val weekUs = 7L * 86400 * 1000000
      val firstUs = raw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val expected = raw
        .map { e =>
          val f = firstUs(e._1)
          val cohort = java.time.Instant.ofEpochSecond(f / 1000000)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate
          ((cohort, (e._2 - f) / weekUs), e._1)
        }
        .groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.length.toLong).toMap
      val got = graft.SparkEntry.queries("z20_retention")(spark, sf)
        .collect()
        .map(r => ((r.getDate(0).toLocalDate, r.getLong(1)), r.getLong(2)))
        .toMap
      assert(got == expected)
      // retention_pct at week 0 is exactly 1.0 for every cohort
      val wk0 = graft.SparkEntry.queries("z20_retention")(spark, sf)
        .filter(col("week_offset") === 0).collect()
      assert(wk0.nonEmpty && wk0.forall(_.getDouble(3) == 1.0))
    }
  }
}
