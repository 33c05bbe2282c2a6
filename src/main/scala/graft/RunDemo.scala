package graft
import org.apache.spark.sql.SparkSession
object RunDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = graft.pipeline.SimulationRun.run(spark,
      "/root/reference/Simulation_Data/miRNA_seq_5_groups_0.2_diff.csv",
      (d1, d2, mult) => graft.nn.ArchZoo.jisaeO1(d1, d2, mult),
      nTrials = 4, cv = 3, epochScale = 0.02)
    res.trials.collect().foreach(r => println(s"[rundemo] trial $r"))
    println(s"[rundemo] best=${res.bestTrial} retrainLosses=${res.retrainLosses.map(l => f"$l%.3f").mkString(",")}")
    println(f"[rundemo] recon mean=${res.reconStats._1}%.4f std=${res.reconStats._2}%.4f")
    res.nbCv.collect().foreach(r => println(s"[rundemo] nb $r"))
    spark.stop()
  }
}
