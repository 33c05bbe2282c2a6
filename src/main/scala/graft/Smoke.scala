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

    // TCGA-shaped pipeline (FIXTURES §1.2 synthetic fixture, S2/S3
    // readers, positional labels, fixed label codes, per-split scaling).
    val tdir = java.nio.file.Files.createTempDirectory("graft-smoke-tcga")
    val rng = new java.util.Random(2023)
    val classes = Seq("breast", "lung", "melanoma", "liver", "sarcoma", "kidney")
    val samples = (0 until 60).map(i => (f"TCGA-$i%02d", classes(i / 10), i / 10))
    def writeMatrix(name: String, width: Int): Unit = {
      val header = ("" +: (0 until width).map(j => s"g$j")).mkString("\t")
      val rows = samples.map { case (sid, _, cIdx) =>
        (sid +: (0 until width).map { j =>
          f"${(if (j % 6 == cIdx) 5.0 else 1.0) + rng.nextGaussian() * 0.3}%.4f"
        }).mkString("\t")
      }
      java.nio.file.Files.writeString(tdir.resolve(name),
        (header +: rows).mkString("\n"))
    }
    writeMatrix("exp.tsv", 24)
    writeMatrix("mirna.tsv", 12)
    java.nio.file.Files.writeString(tdir.resolve("labels.tsv"),
      ("0" +: samples.map { case (_, c, _) => s"Primary Tumor*$c" }).mkString("\n"))
    val tcga = graft.pipeline.TcgaEval.run(spark,
      tdir.resolve("exp.tsv").toString, tdir.resolve("mirna.tsv").toString,
      tdir.resolve("labels.tsv").toString,
      (d1, d2) => graft.nn.ArchZoo.cnc(d1, d2), epochs = 2, batchSize = 32)
    println(s"[smoke] tcga train/test = ${tcga.trainCount}/${tcga.testCount}")
    tcga.reconTable.collect().foreach(r => println(s"[smoke] tcga recon $r"))
    tcga.nbTable.collect().foreach(r => println(s"[smoke] tcga nb $r"))
    require(tcga.trainCount == 48 && tcga.testCount == 12)

    // Optional t-SNE drive (M12): 2-D projection of AE embeddings —
    // the tsn_visulization.py analog. Driver-local O(n²); env-gated to
    // keep the default smoke fast.
    if (sys.env.get("SPARK_GRAFT_SMOKE_TSNE").contains("1")) {
      import graft.etl._
      import org.apache.spark.sql.functions._
      val m = OmicsReader.readTransposed(spark,
        sys.env.getOrElse("SPARK_GRAFT_SIM_FILE",
          "/root/reference/Simulation_Data/miRNA_seq_2_groups_1_diff.csv"))
      val labeled = LabelCodec.withDerivedLabel(m.data,
        LabelCodec.simulationLabelMap)
      val scaled = Scalers.fitTransform(labeled)
      val proj = graft.ml.Tsne.embed2d(scaled,
        cfg = graft.ml.Tsne.Config(perplexity = 20, iters = 500))
        .join(labeled.select("sample_id", "label"), "sample_id")
      val sep = proj.groupBy("label")
        .agg(round(avg("tsne_1"), 2).as("c1"), round(avg("tsne_2"), 2).as("c2"),
          round(stddev_pop("tsne_1"), 2).as("s1"))
        .collect()
      sep.foreach(r => println(s"[smoke] tsne $r"))
      require(sep.length >= 2)
    }
    spark.stop()
  }
}
