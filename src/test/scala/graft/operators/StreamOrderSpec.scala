package graft.operators

import graft.SparkSpec
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Delivery-order contracts verified on a REAL time-shuffled multi-part
  * file layout (ADVICE r13: the in-order assumption was only ever
  * exercised on layouts that happened to deliver in order). The fixture
  * splits the events corpus at the median timestamp and arranges the
  * file source to deliver the LATER half first (modification times
  * control FileStreamSource's batch order; maxFilesPerTrigger=1 forces
  * one file per micro-batch), so every earlier-half event arrives
  * cross-batch out-of-order:
  *  - z23's declarative register aggregation must be IDENTICAL to the
  *    in-order result — max over (event_type, bkt) is commutative and
  *    idempotent, so the sketch is order-robust by construction;
  *  - the funnel state machine must DETECT the breach (guards fire)
  *    while keeping its documented first-delivered-anchor semantics.
  */
class StreamOrderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Build `<root>/events.parquet/` holding the corpus split in two
    * part files, with the LATER half carrying the OLDER mod-time so the
    * file source delivers it first. Returns the root dir. */
  private lazy val shuffledRoot: String = {
    val root = java.nio.file.Files.createTempDirectory("graft-shuffled")
    val target = root.resolve("events.parquet")
    java.nio.file.Files.createDirectory(target)
    val events = EventStream.readEvents(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"))
    val cut = events.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0)(0)
    def writeHalf(pred: org.apache.spark.sql.Column, name: String,
        modMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-half")
      events.filter(pred).coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = target.resolve(name)
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(modMs))
    }
    val t0 = 1600000000000L // fixed epoch base: deterministic ordering
    writeHalf(unix_micros(col("ts")) > cut, "part-0-later.parquet", t0)
    writeHalf(unix_micros(col("ts")) <= cut, "part-1-earlier.parquet",
      t0 + 60000)
    root.toString
  }

  /** Same shuffled two-part layout, keeping the `value` column (the
    * z25 histogram bins over it). */
  private lazy val shuffledValueRoot: String = {
    val root = java.nio.file.Files.createTempDirectory("graft-shuffled-v")
    val target = root.resolve("events.parquet")
    java.nio.file.Files.createDirectory(target)
    val events = EventStream.readEvents(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    val cut = events.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0)(0)
    def writeHalf(pred: org.apache.spark.sql.Column, name: String,
        modMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-half-v")
      events.filter(pred).coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = target.resolve(name)
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(modMs))
    }
    val t0 = 1600000000000L
    writeHalf(unix_micros(col("ts")) > cut, "part-0-later.parquet", t0)
    writeHalf(unix_micros(col("ts")) <= cut, "part-1-earlier.parquet",
      t0 + 60000)
    root.toString
  }

  private def shuffledStream = {
    // same reader shape as EventStream.eventsStream, plus the
    // one-file-per-batch option that makes the shuffle observable
    val path = s"$shuffledRoot/events.parquet"
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(path)
  }

  it("z23's register sketch is bit-identical under out-of-order " +
      "multi-batch delivery (max is commutative + idempotent)") {
    import org.apache.spark.sql.streaming.Trigger
    val regsStream = TextOps.hllBktRho(
      shuffledStream.select(col("event_type"),
        graft.functions.PolyHash64
          .polyhash64(col("user_id").cast("string")).as("h")),
      "event_type")
      .groupBy("event_type", "bkt").agg(max("rho").as("rmax"))
    val q = regsStream.writeStream.format("memory")
      .queryName("t_order_hll").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "fixture must actually deliver in >= 2 micro-batches")
    val streamed = spark.table("t_order_hll")
      .groupBy("event_type", "bkt").agg(max("rmax").as("rmax"))
    // in-order single-pass truth, straight from the batch reader
    val batch = TextOps.hllBktRho(
      EventStream.readEvents(spark, sf)
        .select(col("event_type"),
          graft.functions.PolyHash64
            .polyhash64(col("user_id").cast("string")).as("h")),
      "event_type")
      .groupBy("event_type", "bkt").agg(max("rho").as("rmax"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "shuffled-delivery registers must equal the in-order registers")
  }

  it("z24's count sketch is bit-identical under out-of-order " +
      "multi-batch delivery (counting is order-free)") {
    import org.apache.spark.sql.streaming.Trigger
    // shared builder — the one geometry the QueryDef/terminal/specs use
    val cellsStream = ExtensionOps.cmsCellCounts(shuffledStream)
    val q = cellsStream.writeStream.format("memory")
      .queryName("t_order_cms").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    // per-cell counts are monotone: the latest (max) emission per cell
    // is the final count — the same fold z24 itself uses
    val streamed = spark.table("t_order_cms")
      .groupBy("rw", "cl").agg(max("cnt").as("cnt"))
    val batch = ExtensionOps.cmsCellCounts(EventStream.readEvents(spark, sf))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "shuffled-delivery counts must equal the in-order counts")
  }

  it("z25's histogram sketch is bit-identical under out-of-order " +
      "multi-batch delivery, and the bin clamp bounds state for ANY " +
      "value range") {
    import org.apache.spark.sql.streaming.Trigger
    // the SAME shared builder the z25 QueryDef and JDBC terminal use
    val binsOf = ExtensionOps.quantBinCounts _
    // the shuffled fixture drops the value column — rebuild it from the
    // corpus directly with a one-file-per-batch shuffled layout
    val path = s"$shuffledValueRoot/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(path)
    val q = binsOf(stream).writeStream.format("memory")
      .queryName("t_order_quant").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    val streamed = spark.table("t_order_quant")
      .groupBy("event_type", "bin").agg(max("cnt").as("cnt"))
    val batch = binsOf(EventStream.readEvents(spark, sf))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "shuffled-delivery histogram must equal the in-order histogram")
    // the state bound is BY CONSTRUCTION: bins clamp into [0, QBins),
    // so even a pathological value lands in an edge bin, never a new row
    import spark.implicits._
    val wild = Seq(("e", -1e18), ("e", 1e18), ("e", Double.MaxValue),
      ("e", 12.3)).toDF("event_type", "value")
    val bins = binsOf(wild).select("bin").collect().map(_.getLong(0)).sorted
    assert(bins.forall(b => b >= 0 && b < ExtensionOps.QBins),
      s"clamp must bound every bin: ${bins.toSeq}")
  }

  it("z23's register stream recovers across a checkpoint restart " +
      "(streaming-AGGREGATION state, completing the per-state-class " +
      "restart proofs)") {
    // z15 proves flatMapGroupsWithState restart, the funnel-JDBC spec
    // proves mapGroupsWithState restart; this pins the third state
    // class — the declarative streaming aggregation's HDFS-backed agg
    // state — across a stop, a late file landing, and a fresh query
    // over the SAME checkpoint.
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft-hll-rst")
    val srcDir = tmp.resolve("src").toString
    val ckpt = tmp.resolve("ckpt").toString
    val events = EventStream.readEvents(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"))
    val cut = events.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0)(0)
    events.filter(unix_micros(col("ts")) <= cut).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = events.schema
    def runToCompletion(): Unit = {
      val regs = TextOps.hllBktRho(
        spark.readStream.schema(schema).parquet(srcDir)
          .select(col("event_type"),
            graft.functions.PolyHash64
              .polyhash64(col("user_id").cast("string")).as("h")),
        "event_type")
        .groupBy("event_type", "bkt").agg(max("rho").as("rmax"))
      // COMPLETE mode: every batch re-emits ALL groups, so run 2's
      // final table contains cells whose rmax was set only by run 1 —
      // visible restored state (update mode would leave half-1-only
      // cells silent after the memory sink's restart truncation)
      val q = regs.writeStream.format("memory")
        .queryName("t_hll_rst").outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runToCompletion() // run 1: half the corpus; agg state checkpoints
    events.filter(unix_micros(col("ts")) > cut).coalesce(1)
      .write.mode("append").parquet(srcDir)
    runToCompletion() // run 2: fresh query, same checkpoint = restart
    // run 2's complete-mode table = the restored-and-advanced agg
    // state in full; it must equal the full-corpus batch registers
    val streamed = spark.table("t_hll_rst")
      .select(col("event_type"), col("bkt"), col("rmax"))
    val batch = TextOps.hllBktRho(
      EventStream.readEvents(spark, sf)
        .select(col("event_type"),
          graft.functions.PolyHash64
            .polyhash64(col("user_id").cast("string")).as("h")),
      "event_type")
      .groupBy("event_type", "bkt").agg(max("rho").as("rmax"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "restored agg state + late half must equal full-corpus registers")
  }

  it("the funnel detects the same layout as a contract breach instead " +
      "of silently diverging") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val guards = EventStream.StreamGuards(spark, "t_order_funnel")
    // huge watermark delay: the late half must stay ABOVE the watermark
    // (sub-watermark rows are dropped by Spark itself before the state
    // machine — that layer is observable as numRowsDroppedByWatermark,
    // not through the guards)
    val evs = shuffledStream
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withWatermark("ts", "3650 days")
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[EventStream.FunnelEvent]
    val q = EventStream.funnelChain(evs, 7L * 86400 * 1000000, guards)
      .writeStream.format("memory").queryName("t_order_funnel")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(guards.outOfOrder.value > 0,
      "every earlier-half event arrives below the later half's max — " +
        "the out-of-order counter must see the layout")
    assert(guards.anchorViolations.value > 0,
      "earlier-half views below already-fixed anchors must be counted")
    // the documented semantics hold: u1 (any view anchors, order-free)
    // matches batch; deeper steps may legitimately diverge — that is
    // exactly what the nonzero counters certify
    val streamedU1 = spark.table("t_order_funnel")
      .groupBy("user_id").agg(max("t1").as("t1"))
      .filter(col("t1").isNotNull).count()
    val batchU1 = EventStream.readEvents(spark, sf)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(streamedU1 == batchU1,
      s"funnel entry count must be order-free: $streamedU1 vs $batchU1")
  }
}
