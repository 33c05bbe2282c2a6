package graft

import org.apache.spark.sql.SparkSession

/** Dev audit for z4_stream_windowed's cost structure: run the
  * AvailableNow windowed stream N times and print, per run, the wall
  * time split into stream START (source discovery + planning + state
  * init, paid once per query start regardless of data volume) vs
  * EXECUTION (batch processing, the part that scales with data), plus
  * Spark's own per-batch triggerExecution numbers. Findings land in
  * SCALE.md §z4. */
object StreamAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // match the bench environment: warmed file index (readEvents sets the
    // nanosAsLong conf the TIMESTAMP(NANOS) parquet needs)
    graft.streaming.EventStream.readEvents(spark, sfDir).count()
    (1 to runs).foreach { r =>
      val (startMs, execMs, batches) = graft.streaming.EventStream
        .timeWindowedOnce(spark, sfDir, queryName = s"stream_audit_$r")
      println(s"run $r: start=${startMs}ms exec=${execMs}ms " +
        s"batches=${batches.mkString("[", ",", "]")}ms " +
        s"total=${startMs + execMs}ms")
    }
    spark.stop()
  }
}
