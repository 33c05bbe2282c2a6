package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's t1 check: run SparkEntry.entry and print
  * the row count + first rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned 0 rows")

    // ETL pipeline drive (SURVEY §7.3 minimum slice, data-prep half):
    // reference TSV → transpose → labels → stratified split → min-max.
    val sim = sys.env.getOrElse("SPARK_GRAFT_SIM_FILE",
      "/root/reference/Simulation_Data/miRNA_seq_2_groups_0.2_diff.csv")
    if (new java.io.File(sim).exists()) {
      import graft.etl._
      import org.apache.spark.sql.functions._
      val m = OmicsReader.readTransposed(spark, sim)
      val labeled = LabelCodec.withDerivedLabel(m.data,
        LabelCodec.simulationLabelMap)
      val split = Splits.stratifiedFlag(labeled, "label", "sample_id", 0.8, 42)
      val train = Scalers.fitTransform(split.filter(col("is_train")))
      val summary = train.groupBy("label").agg(
        count(lit(1)).as("n_train"),
        round(avg(aggregate(col("features"), lit(0.0), _ + _)
          / size(col("features"))), 6).as("mean_scaled"))
        .orderBy("label").collect()
      summary.foreach(r => println(s"[smoke] etl $r"))
      require(summary.map(_.getLong(1)).sum == 480, "expected 480 train rows")

      // Full SURVEY §7.3 slice: ingest → split → scale → NB 5-fold CV.
      val cv = graft.pipeline.SimulationNb.run(spark, sim).collect()
      cv.foreach(r => println(s"[smoke] nb_cv fold=${r.getInt(0)} acc=${r.getDouble(1)}"))
      require(cv.length == 5 && cv.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))

      // AE slice (SURVEY §3.1+§3.3 reduced): train a small CNC-style AE,
      // extract embeddings + per-subject recon loss, NB CV on embeddings.
      val aeRes = graft.pipeline.SimulationAe.run(spark, sim, epochs = 3)
      println(s"[smoke] ae epoch losses: ${aeRes.epochLosses.map(l => f"$l%.4f").mkString(", ")}")
      val reconStats = aeRes.trainRecon.agg(avg("recon_loss"), stddev_pop("recon_loss")).head()
      println(f"[smoke] ae recon mean=${reconStats.getDouble(0)}%.4f std=${reconStats.getDouble(1)}%.4f")
      aeRes.nbCv.collect().foreach(r =>
        println(s"[smoke] ae nb_cv fold=${r.getInt(0)} acc=${r.getDouble(1)}"))
      require(aeRes.epochLosses.last < aeRes.epochLosses.head,
        "AE loss did not decrease")

      // Graph-engine drive: JISAE-O3 (3-branch + ortho loss) at real dims.
      val gRes = graft.pipeline.SimulationAe.runArch(spark, sim,
        (d1, d2) => graft.nn.ArchZoo.jisaeO3(d1, d2, orthoMultiplier = 0.1))
      println(s"[smoke] jisaeO3 epoch losses: ${gRes.epochLosses.map(l => f"$l%.4f").mkString(", ")}")
      gRes.nbCv.collect().foreach(r =>
        println(s"[smoke] jisaeO3 nb_cv fold=${r.getInt(0)} acc=${r.getDouble(1)}"))
      require(gRes.epochLosses.forall(l => !l.isNaN && !l.isInfinite))
    }
    spark.stop()
  }
}
