package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.{LabelCodec, OmicsReader}

/** Dev driver: ingest-robustness sweep over the whole reference
  * simulation corpus (20 files, 2–5 groups × 5 differential levels) —
  * S1 transpose + label derivation + shape/label-count checks on every
  * file. Run: sbt "runMain graft.CorpusSweep"
  */
object CorpusSweep {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/root/reference/Simulation_Data")
    val files = dir.listFiles().filter(_.getName.endsWith(".csv")).sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var ok = 0
    files.foreach { f =>
      val groups = f.getName.split("_")(2).toInt
      val m = OmicsReader.readTransposed(spark, f.getPath)
      val labeled = LabelCodec.withDerivedLabel(
        m.data, LabelCodec.simulationLabelMap)
      val counts = labeled.groupBy("label_idx").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val width = labeled.select(size(col("features"))).head().getInt(0)
      val pass = counts.size == groups &&
        counts.values.forall(_ == 600L / groups) && width == 1046
      println(s"[sweep] ${f.getName}: groups=${counts.size} " +
        s"per-class=${counts.values.toSeq.distinct.mkString(",")} " +
        s"width=$width ${if (pass) "OK" else "MISMATCH"}")
      if (pass) ok += 1
    }
    println(s"[sweep] $ok/${files.length} files OK")
    require(ok == files.length, "corpus sweep found mismatches")
    spark.stop()
  }
}
