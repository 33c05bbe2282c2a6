package graft

import org.apache.spark.sql.SparkSession

/** Dev driver: the 8-architecture AE_results-style comparison table on a
  * reference simulation file. Run:
  *   sbt "runMain graft.ArchBench [simFile] [epochs]"
  */
object ArchBench {
  def main(args: Array[String]): Unit = {
    val sim = args.headOption.getOrElse(
      "/root/reference/Simulation_Data/miRNA_seq_2_groups_1_diff.csv")
    val epochs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val table = graft.pipeline.ArchComparison.run(spark, sim,
      epochs = epochs)
    table.collect().foreach(r => println(s"[archbench] $r"))
    println(f"[archbench] wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
