package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset handling for training-data pipelines: image/audio/
  * video as opaque BINARY columns + typed metadata struct, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * batch operators.
  *
  * The Spark-side plumbing (schema, batching, partitioning, operator
  * signatures) is real. The IMAGE decode path is real too: PNG/JPEG/
  * GIF/BMP byte streams decode through `javax.imageio` (ships in the
  * JDK — zero new dependencies), the AUDIO path decodes WAV/AU/
  * AIFF byte streams through `javax.sound.sampled` (also JDK-built-in),
  * and the VIDEO path decodes MJPEG (concatenated-JPEG) streams by
  * SOI/EOI marker scan + per-frame `javax.imageio` decode — the one
  * video container the JDK's codecs can carry. Other video containers
  * (mp4/h264…) still fall back to the clearly-marked DETERMINISTIC
  * STUB (the JDK ships no inter-frame codec) — swap `StubCodec` for
  * e.g. javacpp ffmpeg bindings without touching the operators.
  *
  * Scale notes: assets stay as single binary cells (no driver
  * collection); feature extraction streams partition-locally in blocks;
  * a repartition on asset_id spreads hot partitions before CPU-heavy
  * decode. Metadata-only plans never touch the binary column thanks to
  * parquet column pruning.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** REAL image decoder — `javax.imageio` (in the JDK since 1.4, so zero
    * new dependencies; PNG, JPEG, GIF and BMP readers are built in).
    * Container-format detection is by magic bytes, so the cheap common
    * case (synthetic non-image cells) never pays an exception-driven
    * decode attempt. */
  object ImageCodec {
    // ImageIO defaults to a DISK-backed stream cache: every
    // encode/decode of an in-memory byte array round-trips a temp FILE,
    // which at probe scale is ~583k tiny file create/write/delete
    // cycles per pass (measured 2x+ wall on z17 when /tmp is busy).
    // The engine only ever codecs byte arrays — cache in memory.
    javax.imageio.ImageIO.setUseCache(false)

    /** True iff the bytes start with a PNG/JPEG/GIF/BMP signature. */
    def looksLikeImage(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) || // JPEG SOI
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        (b(0) == 'B' && b(1) == 'M'))

    /** Decode → (width, height, mean Rec.601 luma in [0,1]);
      * None when the bytes are not a decodable image. */
    def decode(content: Array[Byte]): Option[(Int, Int, Double)] =
      if (!looksLikeImage(content)) None
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)) / 255.0
              x += 1
            }
            y += 1
          }
          Some((w, h, sum / (w.toLong * h)))
        }
      } catch { case _: Exception => None }
  }

  /** REAL audio decoder — `javax.sound.sampled` (JDK `java.desktop`
    * module, zero new dependencies; WAV, AU and AIFF container readers
    * plus PCM/µ-law/a-law codecs are built in). Container detection by
    * magic bytes, mirroring [[ImageCodec]]: synthetic non-audio cells
    * never pay an exception-driven parse attempt. */
  object AudioCodec {
    /** True iff the bytes start with a WAV (RIFF/WAVE), AU (.snd) or
      * AIFF (FORM/AIFF) container signature. */
    def looksLikeAudio(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 && (
        (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
        (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') ||
        (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
          b(8) == 'A' && b(9) == 'I' && b(10) == 'F'))

    /** Decode → (sample_rate, channels, duration_ms, RMS amplitude in
      * [0,1]); None when the bytes are not decodable audio. Any input
      * encoding (8/16/24-bit PCM, µ-law, a-law, either endianness) is
      * normalized through a PCM_SIGNED 16-bit transcode so RMS is
      * comparable across sources. */
    def decode(content: Array[Byte]): Option[(Int, Int, Long, Double)] =
      if (!looksLikeAudio(content)) None
      else try {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val raw = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        val sf = raw.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          sf.getSampleRate, 16, sf.getChannels,
          sf.getChannels * 2, sf.getSampleRate, false)
        val in = AudioSystem.getAudioInputStream(target, raw)
        val bytes = in.readAllBytes()
        in.close(); raw.close()
        val n = bytes.length / 2
        var sumSq = 0.0
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
          val v = s / 32768.0
          sumSq += v * v
          i += 1
        }
        val rate = math.round(sf.getSampleRate).toInt
        val frames = n / math.max(1, sf.getChannels)
        val durMs = math.round(frames * 1000.0 / rate)
        Some((rate, sf.getChannels, durMs,
          if (n == 0) 0.0 else math.sqrt(sumSq / n)))
      } catch { case _: Exception => None }
  }

  /** REAL video decoder for the MJPEG (Motion-JPEG) container: a video
    * stream that is just JPEG frames back to back — the format IP
    * cameras and `ffmpeg -f mjpeg` emit, and the only video container
    * decodable with zero new dependencies (each frame rides the JDK's
    * `javax.imageio` JPEG codec). Frames are split by JPEG marker scan:
    * a frame spans SOI (FFD8) to EOI (FFD9). The scan is sound because
    * JPEG byte-stuffs 0xFF inside entropy-coded data as FF00 (and
    * restart markers are FFD0-D7), so a raw FFD9 can only be EOI; the
    * one caveat is EXIF thumbnails (a nested SOI/EOI inside APP1),
    * which MJPEG streams don't carry — baseline JFIF frames only. */
  object VideoCodec {
    // see ImageCodec: byte-array codecs must not round-trip temp files
    javax.imageio.ImageIO.setUseCache(false)

    /** True iff the bytes start with a JPEG SOI marker (an MJPEG stream
      * is its first frame's JPEG). */
    def looksLikeMjpeg(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 &&
        b(0) == 0xff.toByte && b(1) == 0xd8.toByte

    /** Split a concatenated-JPEG stream into per-frame byte slices
      * (SOI..EOI inclusive). Bytes between frames (padding, timestamps
      * in some camera dialects) are skipped. */
    def splitFrames(b: Array[Byte]): Seq[Array[Byte]] = {
      val out = Seq.newBuilder[Array[Byte]]
      var i = 0
      var start = -1
      while (i < b.length - 1) {
        if (start < 0) {
          if (b(i) == 0xff.toByte && b(i + 1) == 0xd8.toByte) {
            start = i; i += 2
          } else i += 1
        } else {
          if (b(i) == 0xff.toByte && b(i + 1) == 0xd9.toByte) {
            out += java.util.Arrays.copyOfRange(b, start, i + 2)
            start = -1; i += 2
          } else i += 1
        }
      }
      out.result()
    }

    /** Decode an MJPEG stream → per-frame (width, height, mean Rec.601
      * luma in [0,1]); None when the bytes are not an MJPEG stream or
      * any frame fails to decode. */
    def decodeFrames(content: Array[Byte]): Option[Seq[(Int, Int, Double)]] =
      if (!looksLikeMjpeg(content)) None
      else try {
        val frames = splitFrames(content).map { fb =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(fb))
          if (img == null) return None
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)) / 255.0
              x += 1
            }
            y += 1
          }
          (w, h, sum / (w.toLong * h))
        }
        if (frames.isEmpty) None else Some(frames)
      } catch { case _: Exception => None }
  }

  /** DETERMINISTIC STUB codec for video containers beyond MJPEG (the
    * JDK ships no inter-frame codec) and for synthetic non-media cells.
    * Replace with a real decoder; operators below are agnostic. */
  object StubCodec {
    /** "Decode" → (width, height, mean intensity in [0,1]). */
    def decodeImage(content: Array[Byte], w: Int, h: Int): (Int, Int, Double) = {
      var acc = 0L
      var i = 0
      while (i < content.length) { acc += (content(i) & 0xff); i += 1 }
      (w, h, if (content.isEmpty) 0.0 else acc.toDouble / content.length / 255.0)
    }
    /** "Decode audio" → (sample_rate, channels, duration_ms, byte-mean
      * amplitude in [0,1]) from the metadata + raw bytes. */
    def decodeAudio(content: Array[Byte], sampleRate: Int,
        durationMs: Long): (Int, Int, Long, Double) = {
      var acc = 0L
      var i = 0
      while (i < content.length) { acc += (content(i) & 0xff); i += 1 }
      (sampleRate, 1, durationMs,
        if (content.isEmpty) 0.0 else acc.toDouble / content.length / 255.0)
    }

    /** "Embed" → dim floats derived from a rolling hash (unit-norm). */
    def feature(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var hsh = 1125899906842597L
      var i = 0
      while (i < content.length) {
        hsh = 31 * hsh + (content(i) & 0xff); i += 1
      }
      var d = 0
      while (d < dim) {
        val v = (hsh ^ (d.toLong * 0x9e3779b97f4a7c15L))
        out(d) = ((v % 1000).toFloat / 1000.0f)
        d += 1
      }
      val n = math.sqrt(out.map(x => x * x).sum).toFloat max 1e-12f
      out.map(_ / n)
    }
  }

  /** Build a deterministic synthetic asset table from `documents`
    * (the container has no real media; the bytes are the UTF-8 text,
    * metadata derived from doc stats — STUB data, real schema). */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("asset_id"),
      modality.as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        concat(lit("application/x-stub-"),
          element_at(array(lit("png"), lit("wav"), lit("mp4")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int"))).as("mime"),
        (pmod(col("n_chars"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).as("duration_ms")).as("meta"))
  }

  /** Feature extraction: binary → Array[Float] embedding, block-batched
    * per partition (the mapInPandas-batch analog: operators see row
    * blocks, not single rows). */
  def withFeatures(assets: DataFrame, dim: Int = 16,
      blockSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    val ci = assets.schema.fieldIndex("content")
    val outSchema = StructType(assets.schema.fields :+
      StructField("feature", ArrayType(FloatType)))
    val rdd = assets.rdd.mapPartitions { it =>
      it.grouped(blockSize).flatMap { block =>
        block.map { r =>
          val f = StubCodec.feature(r.getAs[Array[Byte]](ci), dim)
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Image decode: binary → (dec_width, dec_height, mean_intensity)
    * columns, partition-local (the CPU-heavy decode never leaves the
    * executor; no shuffle, no driver collection). Real PNG/JPEG/GIF/BMP
    * byte streams decode via [[ImageCodec]] (`javax.imageio`); cells
    * whose bytes are not a decodable image (the synthetic stub corpus)
    * fall back to [[StubCodec]] with the metadata dims — so the operator
    * is exact on real images and deterministic on stub data. */
  def decodeImages(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val ci = assets.schema.fieldIndex("content")
    val mi = assets.schema.fieldIndex("meta")
    val outSchema = StructType(assets.schema.fields ++ Seq(
      StructField("dec_width", IntegerType),
      StructField("dec_height", IntegerType),
      StructField("mean_intensity", DoubleType)))
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { r =>
        val content = r.getAs[Array[Byte]](ci)
        val meta = r.getStruct(mi)
        val (w, h, inten) = ImageCodec.decode(content).getOrElse(
          StubCodec.decodeImage(content,
            meta.getAs[Int]("width"), meta.getAs[Int]("height")))
        // Seq[Any], not Seq(w, h, inten): Scala would widen the Ints to
        // Double and the Row encoder rejects Double-for-INT at runtime
        Row.fromSeq(r.toSeq ++ Seq[Any](w, h, inten))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio decode: binary → (dec_sample_rate, dec_channels,
    * dec_duration_ms, rms_amplitude) columns, partition-local like
    * [[decodeImages]]. Real WAV/AU/AIFF byte streams decode via
    * [[AudioCodec]] (`javax.sound.sampled`); cells whose bytes are not
    * decodable audio (the synthetic stub corpus) fall back to
    * [[StubCodec]] with the metadata rate/duration — exact on real
    * audio, deterministic on stub data. */
  def decodeAudio(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val ci = assets.schema.fieldIndex("content")
    val mi = assets.schema.fieldIndex("meta")
    val outSchema = StructType(assets.schema.fields ++ Seq(
      StructField("dec_sample_rate", IntegerType),
      StructField("dec_channels", IntegerType),
      StructField("dec_duration_ms", LongType),
      StructField("rms_amplitude", DoubleType)))
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { r =>
        val content = r.getAs[Array[Byte]](ci)
        val meta = r.getStruct(mi)
        val (rate, ch, dur, rms) = AudioCodec.decode(content).getOrElse(
          StubCodec.decodeAudio(content,
            meta.getAs[Int]("sample_rate"), meta.getAs[Long]("duration_ms")))
        Row.fromSeq(r.toSeq ++ Seq[Any](rate, ch, dur, rms))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL-codec round trip, image arm: per asset, paint a WxH RGB
    * image from integer rules of `doc_id`, encode it to actual PNG
    * bytes (`javax.imageio` writer), decode those bytes back
    * (`javax.imageio` reader), and emit the decoded dims plus exact
    * integer per-channel pixel sums. PNG is lossless, so the decoded
    * sums must equal what the paint rules imply — which an external
    * SQL engine can recompute from the rules alone, making a REAL
    * encode→decode cycle value-checkable by the DuckDB oracle (the
    * stub-free proof the synthetic z1/z2 arithmetic can't give).
    * Scale shape: everything is partition-local CPU in one
    * mapPartitions (no shuffle, no driver traffic); at 100 TB this is
    * exactly the distributed-codec batch shape of decodeImages. */
  def imageRoundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs.select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 0)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("dec_width", IntegerType),
      StructField("dec_height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val rdd = ids.rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val w = (id % 13 + 4).toInt
        val h = (id % 11 + 4).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val g = ((id * 17 + x * 11 + y * 5) % 256).toInt
            val b = ((id * 29 + x * 3 + y * 19) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val png = bos.toByteArray
        require(ImageCodec.looksLikeImage(png), s"asset $id: bad PNG magic")
        val dec = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        var (sr, sg, sb) = (0L, 0L, 0L)
        y = 0
        while (y < dec.getHeight) {
          var x = 0
          while (x < dec.getWidth) {
            val rgb = dec.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Row(id, dec.getWidth, dec.getHeight, sr, sg, sb)
      }
    }
    // Persist the decoded aggregates: the contract query's presentation
    // ORDER BY is a range sort whose boundary-sampling pass would
    // otherwise re-execute this whole codec RDD (measured 2x decode at
    // the x1000 probe). Rows here are slim per-asset aggregates, and
    // Spark's ContextCleaner unpersists automatically once the frame is
    // unreachable, so decode stays once-per-invocation.
    spark.createDataFrame(
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      outSchema)
  }

  /** REAL-codec round trip, audio arm: per asset, synthesize 16-bit
    * PCM samples from integer rules of `doc_id`, encode them into an
    * actual WAV container (`javax.sound.sampled` writer), decode the
    * bytes back through [[AudioCodec]], and emit the decoded rate /
    * channels / duration / RMS. Every RMS term is (s/32768)² with s a
    * known integer — binary-exact doubles whose ≤69-term sum fits a
    * 53-bit mantissa losslessly, so the value is bit-deterministic
    * regardless of summation order and an external SQL engine
    * recomputes it exactly from the rules. Partition-local like the
    * image arm. */
  def audioRoundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs.select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 1)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("dec_sample_rate", IntegerType),
      StructField("dec_channels", IntegerType),
      StructField("dec_duration_ms", LongType),
      StructField("rms", DoubleType)))
    val rdd = ids.rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val n = (id % 50 + 20).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = (((id * 7919 + i * 104729L) % 65536) - 32768).toShort
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(
          new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          AudioFileFormat.Type.WAVE, bos)
        val wav = bos.toByteArray
        val (rate, ch, durMs, rms) = AudioCodec.decode(wav).getOrElse(
          throw new IllegalStateException(s"asset $id: WAV decode failed"))
        Row(id, rate, ch, durMs, rms)
      }
    }
    // persist: kills the range-sort sampling re-decode (see imageRoundTrip)
    spark.createDataFrame(
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      outSchema)
  }

  /** Video decode: binary → (n_frames, f0_width, f0_height, mean_luma)
    * columns, partition-local like [[decodeImages]]. Real MJPEG streams
    * decode frame-by-frame via [[VideoCodec]] (`javax.imageio` per
    * frame); cells whose bytes are not MJPEG (the synthetic stub corpus,
    * or containers the JDK can't decode) fall back to [[StubCodec]]
    * with the metadata dims and n_frames = 0 — exact on MJPEG,
    * deterministic on stub data. */
  def decodeVideo(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val ci = assets.schema.fieldIndex("content")
    val mi = assets.schema.fieldIndex("meta")
    val outSchema = StructType(assets.schema.fields ++ Seq(
      StructField("n_frames", IntegerType),
      StructField("f0_width", IntegerType),
      StructField("f0_height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { r =>
        val content = r.getAs[Array[Byte]](ci)
        val meta = r.getStruct(mi)
        val (n, w, h, luma) = VideoCodec.decodeFrames(content) match {
          case Some(frames) =>
            (frames.size, frames.head._1, frames.head._2,
              frames.map(_._3).sum / frames.size)
          case None =>
            val (sw, sh, inten) = StubCodec.decodeImage(content,
              meta.getAs[Int]("width"), meta.getAs[Int]("height"))
            (0, sw, sh, inten)
        }
        Row.fromSeq(r.toSeq ++ Seq[Any](n, w, h, luma))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL-codec round trip, video arm: per asset, paint `id % 4 + 2`
    * grayscale frames from integer rules of `doc_id`, JPEG-encode each
    * (`javax.imageio` writer), concatenate them into an actual MJPEG
    * stream, split it back by SOI/EOI marker scan and decode every
    * frame ([[VideoCodec]]). JPEG is LOSSY, so unlike the PNG/WAV arms
    * the pixel VALUES are not oracle-checkable — but the container
    * structure is: frame count and per-frame decoded dimensions are
    * bit-exact functions of the paint rules, which an external SQL
    * engine recomputes from the rules alone. The lossy luma path is
    * gold-tested (spec asserts decoded mean luma within JPEG tolerance
    * of the painted mean). Partition-local like the other arms: encode,
    * scan and decode all happen inside one mapPartitions — the
    * distributed-codec batch shape of [[decodeVideo]] at 100 TB. */
  def videoRoundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs.select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(3)) === 2)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("frame_idx", LongType),
      StructField("dec_width", IntegerType),
      StructField("dec_height", IntegerType)))
    val rdd = ids.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val nFrames = (id % 4 + 2).toInt
        val bos = new java.io.ByteArrayOutputStream()
        var k = 0
        while (k < nFrames) {
          val w = ((id + k) % 9 + 4).toInt
          val h = ((id + 2L * k) % 7 + 4).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // grayscale (r=g=b) keeps chroma subsampling out of the
              // lossy error budget for the gold-tested luma check
              val v = ((id * 23 + x * 5 + y * 7 + k * 3) % 256).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          javax.imageio.ImageIO.write(img, "jpg", bos)
          k += 1
        }
        val mjpeg = bos.toByteArray
        require(VideoCodec.looksLikeMjpeg(mjpeg), s"asset $id: bad SOI")
        val frames = VideoCodec.decodeFrames(mjpeg).getOrElse(
          throw new IllegalStateException(s"asset $id: MJPEG decode failed"))
        require(frames.size == nFrames,
          s"asset $id: SOI/EOI scan found ${frames.size} of $nFrames frames")
        frames.zipWithIndex.map { case ((w, h, _), idx) =>
          Row(id, idx.toLong, w, h)
        }
      }
    }
    // persist: kills the range-sort sampling re-decode (see imageRoundTrip)
    spark.createDataFrame(
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      outSchema)
  }

  /** Image resize: metadata transform + stubbed re-decode; video
    * frame-sampling: one row per sampled frame (real explode shape). */
  def resizeImages(assets: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height"))
        .cast("double"))
    assets.withColumn("meta", struct(
      col("meta.mime"),
      ceil(col("meta.width") * scale).cast("int").as("width"),
      ceil(col("meta.height") * scale).cast("int").as("height"),
      col("meta.sample_rate"), col("meta.duration_ms")))
  }

  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets.filter(col("modality") === "video")
      .withColumn("frame_ts",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
      .select(col("asset_id"), col("frame_ts"), col("meta"))

  /** Decode summary (stub): per-modality asset count, byte volume, and
    * mean stub intensity — the metadata-only side never reads `content`
    * when pruned. */
  def modalityProfile(assets: DataFrame): DataFrame = {
    val withIntensity = withFeatures(assets, dim = 4)
      .withColumn("intensity",
        aggregate(col("feature"), lit(0.0), (a, x) => a + x) / 4.0)
    withIntensity.groupBy("modality")
      .agg(count(lit(1)).as("n_assets"),
        sum(length(col("content"))).as("total_bytes"),
        round(avg("intensity"), 4).as("mean_intensity"))
      .orderBy("modality")
  }
}
