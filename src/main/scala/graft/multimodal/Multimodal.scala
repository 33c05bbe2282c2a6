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
  * signatures) is real; the codec itself is a clearly-marked
  * DETERMINISTIC STUB (image/audio libraries are not available in this
  * environment) — swap `StubCodec` for a real decoder (e.g. javacpp
  * ffmpeg/opencv bindings) without touching the operators.
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

  /** DETERMINISTIC STUB codec: derives pseudo pixels/samples from the
    * bytes. Replace with a real decoder; operators below are agnostic. */
  object StubCodec {
    /** "Decode" → (width, height, mean intensity in [0,1]). */
    def decodeImage(content: Array[Byte], w: Int, h: Int): (Int, Int, Double) = {
      var acc = 0L
      var i = 0
      while (i < content.length) { acc += (content(i) & 0xff); i += 1 }
      (w, h, if (content.isEmpty) 0.0 else acc.toDouble / content.length / 255.0)
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
