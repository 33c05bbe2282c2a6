package graft

import org.apache.spark.sql.SparkSession

/** Dev driver: quality evidence across the reference's OWN simulation
  * grid — 20 datasets (2–5 groups × 0.2–1.0 differential), the outer
  * loop of Simulation_Models/CNC_AE_model_selection.py:557-582 (which
  * runs 8 models × 20 datasets × 50 GPU trials; here: CPU-scale trial
  * budgets, same composition: search → retrain → per-subject recon →
  * embedding NB CV).
  *
  * Usage: runMain graft.QualitySweep [nTrials] [epochScale] [mode] \
  *          [archFilter] [groupFilter]
  *   mode = "grid"  (default): 1 arch (JISAE-O1) × all 20 datasets
  *   mode = "archs": all 8 families × 5-dataset difficulty slice
  *   mode = "ref":   all 8 families × the reference's full 20-dataset
  *          grid (AE_results.ipynb cell 26 publishes per-dataset
  *          training-recon aggregates for exactly this grid) —
  *          archFilter (comma-joined family names), groupFilter
  *          (comma-joined group counts) and diffFilter (arg 5,
  *          comma-joined differential levels, e.g. "0.6,0.8,1")
  *          select a slice so the 160-run sweep can be split across —
  *          and resumed on — parallel JVMs; results are
  *          JVM-split-invariant because every run is a pure function
  *          of (dataset, family, seed) — proven by the r7 cross-boot
  *          reproduction.
  *   mode = "reftest": all 8 families × 5_groups_1 ONLY — the one
  *          dataset whose held-out TEST recon aggregate the reference
  *          notebook publishes numerically (AE_results.ipynb cell 30);
  *          appends test_recon_mean,test_recon_std to each line.
  */
object QualitySweep {

  private val dataDir = "/root/reference/Simulation_Data"

  private def datasets(groups: Seq[Int], diffs: Seq[String]): Seq[String] =
    for (g <- groups; f <- diffs)
      yield s"$dataDir/miRNA_seq_${g}_groups_${f}_diff.csv"

  def main(args: Array[String]): Unit = {
    val nTrials = args.lift(0).map(_.toInt).getOrElse(3)
    val epochScale = args.lift(1).map(_.toDouble).getOrElse(0.02)
    val mode = args.lift(2).getOrElse("grid")

    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val archFilter = args.lift(3).map(_.split(",").toSet)
    val groupFilter = args.lift(4).map(_.split(",").map(_.toInt).toSet)
    val diffFilter = args.lift(5).map(_.split(",").toSet)

    val archs: Seq[(String, (Int, Int, Double) => graft.nn.ArchZoo.Arch)] =
      mode match {
        // all 8 reference families (CNC_AE_model_selection.py and its 7
        // sibling scripts) through the same search→retrain→recon→NB path
        case "archs" | "ref" | "reftest" => pipeline.ArchFamilies.byName
        case _ => pipeline.ArchFamilies.byName.filter(_._1 == "JISAE-O1")
      }
    val files = mode match {
      case "reftest" => Seq(s"$dataDir/miRNA_seq_5_groups_1_diff.csv")
      case "ref" => datasets(
        Seq(2, 3, 4, 5).filter(g => groupFilter.forall(_.contains(g))),
        Seq("0.2", "0.4", "0.6", "0.8", "1")
          .filter(d => diffFilter.forall(_.contains(d))))
      case "archs" => Seq(
        s"$dataDir/miRNA_seq_2_groups_1_diff.csv",
        s"$dataDir/miRNA_seq_3_groups_0.6_diff.csv",
        s"$dataDir/miRNA_seq_4_groups_0.4_diff.csv",
        s"$dataDir/miRNA_seq_5_groups_0.2_diff.csv",
        s"$dataDir/miRNA_seq_5_groups_1_diff.csv")
      case _ => datasets(Seq(2, 3, 4, 5), Seq("0.2", "0.4", "0.6", "0.8", "1"))
    }

    val selected = archs.filter { case (n, _) =>
      archFilter.forall(_.contains(n)) }
    println("[qsweep] arch,dataset,best_trial,best_cv_loss,retrain_first," +
      "retrain_last,recon_mean,recon_std,nb_acc_mean")
    for ((archName, mk) <- selected; f <- files) {
      val name = f.split("/").last.stripPrefix("miRNA_seq_")
        .stripSuffix("_diff.csv")
      val t0 = System.nanoTime()
      try {
        val res = pipeline.SimulationRun.run(spark, f, mk,
          nTrials = nTrials, cv = 3, epochScale = epochScale)
        val bestLoss = res.trials
          .filter(org.apache.spark.sql.functions.col("trial") === res.bestTrial)
          .select("recon_loss").head().getDouble(0)
        val nbAcc = res.nbCv
          .agg(org.apache.spark.sql.functions.avg("accuracy"))
          .head().getDouble(0)
        val secs = (System.nanoTime() - t0) / 1e9
        val testCols =
          if (mode == "reftest")
            f",${res.testReconStats._1}%.4f,${res.testReconStats._2}%.4f"
          else ""
        println(f"[qsweep] $archName,$name,${res.bestTrial}," +
          f"$bestLoss%.4f,${res.retrainLosses.head}%.4f," +
          f"${res.retrainLosses.last}%.4f,${res.reconStats._1}%.4f," +
          f"${res.reconStats._2}%.4f,$nbAcc%.4f$testCols  (${secs}%.0fs)")
      } catch {
        case e: Throwable =>
          println(s"[qsweep] $archName,$name,FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
