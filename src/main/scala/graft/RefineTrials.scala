package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.search.RandomSearch

/** Worker/combiner pair for the in-basin refinement measurement
  * (QUALITY_r11, VERDICT r10 ask #1): extends the full-breadth search
  * of QUALITY_r10 with `ROUNDS` × `PERROUND` deterministic refinement
  * trials around the best-so-far (`RandomSearch.refineSequence` — the
  * replay-compatible counterpart of Optuna TPE's adaptive in-basin
  * exploitation, CNC_AE_model_selection.py:528-534).
  *
  * Why workers stay sound: a refinement ROUND's hypers depend on
  * earlier trials only through the replayed best-so-far, which every
  * worker re-derives bit-identically from the shared loss file
  * (`RandomSearch.refineRoundPlan`); within a round the trials are
  * independent exactly like base trials (cv=3/warmup=2: the pruner
  * only marks after the last fold). Rounds are barriers: run all
  * workers of round r, append their `[rtrial]` lines to the loss file,
  * then plan round r+1. `RefineReplaySpec` pins live == replay.
  *
  * Usage:
  *   runMain graft.RefineTrials plan <nBase> <round> <perRound> <lossFile>
  *     — prints the round's trial plan: [rplan] t=<globalIdx> epochs=…
  *   runMain graft.RefineTrials run <nBase> <epochScale> <arch> \
  *     <dataset> <round> <perRound> <lossFile> <trialsCsv(globalIdx)>
  *     — output lines: [rtrial] t=<globalIdx> losses=<l0>,<l1>,<l2>
  *   runMain graft.RefineCombine <nBase> <epochScale> <arch> <dataset> \
  *     <rounds> <perRound> <lossFile>
  *     — replays base+refine, retrains + evals the final best.
  * Env: BREADTH_SEED (default 42), REFINE_SHRINK (default 8.0).
  * lossFile lines: "t=<i> losses=<l0>,<l1>,…" ([btrial]/[rtrial] both
  * match), trials 0..nBase-1 base, nBase.. refine in round order.
  */
object RefineTrials {

  private val dataDir = "/root/reference/Simulation_Data"
  private val cv = 3

  private[graft] def readLosses(lossFile: String): Map[Int, Seq[Double]] = {
    // optional `cv=` tag (r12 BreadthTrials lines carry it; the refine
    // path is fixed cv=3, so a tagged line must agree — ADVICE r11)
    val rx = """t=(\d+) (?:cv=(\d+) )?losses=([0-9eE+\-.,NaN]+)""".r.unanchored
    scala.io.Source.fromFile(lossFile).getLines()
      .collect { case rx(t, cvTag, ls) =>
        if (cvTag != null) require(cvTag.toInt == cv,
          s"loss file trial $t was computed at cv=$cvTag; refine is cv=$cv")
        t.toInt -> ls.split(",").map(_.toDouble).toSeq }
      .toMap
  }

  /** Loss rows 0..n-1 as a dense Seq, failing loudly on gaps. */
  private[graft] def dense(byTrial: Map[Int, Seq[Double]],
      n: Int): Seq[Seq[Double]] = {
    val missing = (0 until n).filterNot(byTrial.contains)
    require(missing.isEmpty, s"loss file missing trials ${missing.mkString(",")}")
    (0 until n).map(byTrial)
  }

  def main(args: Array[String]): Unit = {
    val cmd = args(0)
    val seed = sys.env.getOrElse("BREADTH_SEED", "42").toLong
    val shrink = sys.env.getOrElse("REFINE_SHRINK", "8.0").toDouble

    if (cmd == "plan") {
      val nBase = args(1).toInt
      val round = args(2).toInt
      val perRound = args(3).toInt
      val byTrial = readLosses(args(4))
      val hypers = RandomSearch.refineRoundPlan(
        RandomSearch.hyperSequence(nBase, seed),
        dense(byTrial, nBase + round * perRound), round, perRound, cv,
        seed, shrink = shrink)
      hypers.zipWithIndex.foreach { case (h, i) =>
        val t = nBase + round * perRound + i
        println(f"[rplan] t=$t epochs=${h.epochs} batch=${h.batchSize} " +
          f"lr=${h.lr}%.6g l2=${h.l2}%.6g ortho=${h.orthoMultiplier}%.6g")
      }
      return
    }

    require(cmd == "run", s"unknown cmd $cmd")
    val nBase = args(1).toInt
    val epochScale = args(2).toDouble
    val arch = args(3)
    val dataset = args(4)
    val round = args(5).toInt
    val perRound = args(6).toInt
    val byTrial = readLosses(args(7))
    val trials = args(8).split(",").map(_.toInt).toSeq

    val roundBase = nBase + round * perRound
    val hypers = RandomSearch.refineRoundPlan(
      RandomSearch.hyperSequence(nBase, seed),
      dense(byTrial, roundBase), round, perRound, cv, seed,
      shrink = shrink)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("BREADTH_MASTER", "local[6]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val prep = pipeline.SimulationRun.prepare(spark,
      s"$dataDir/miRNA_seq_${dataset}_diff.csv")
    val folded = graft.etl.Splits
      .kFoldColumn(prep.paired, "sample_id", cv, 21).cache()
    folded.count()
    val mkArch = pipeline.ArchFamilies(arch)

    for (t <- trials) {
      require(t >= roundBase && t < roundBase + perRound,
        s"trial $t outside round $round [${roundBase}, ${roundBase + perRound})")
      val h = hypers(t - roundBase)
      val epochs = math.max(1, math.round(h.epochs * epochScale).toInt)
      val model = mkArch(prep.splitAt, prep.d2, h.orthoMultiplier).model
      val t0 = System.nanoTime()
      val losses = (0 until cv).map { f =>
        val trained = graft.nn.Trainer.train(
          folded.filter(col("fold") =!= f), model,
          graft.nn.Trainer.Config(lr = h.lr, weightDecay = h.l2,
            batchSize = h.batchSize, epochs = epochs, seed = 21))
        graft.nn.Trainer.evaluateLoss(folded.filter(col("fold") === f),
          model, trained.params, trained.stats)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"[rtrial] t=$t losses=${losses.mkString(",")} " +
        f"secs=$secs%.0f")
    }
    spark.stop()
    println("[rtrial] WORKER DONE")
  }
}

/** Replays base + all refinement rounds over the complete loss file,
  * then retrains + evals the final best through the same §3.2/§3.3
  * path as `SimulationRun.run` (identical to `BreadthCombine`'s eval,
  * so the refined row is directly comparable to the breadth curve). */
object RefineCombine {

  private val dataDir = "/root/reference/Simulation_Data"

  def main(args: Array[String]): Unit = {
    val nBase = args(0).toInt
    val epochScale = args(1).toDouble
    val arch = args(2)
    val dataset = args(3)
    val rounds = args(4).toInt
    val perRound = args(5).toInt
    val byTrial = RefineTrials.readLosses(args(6))
    val seed = sys.env.getOrElse("BREADTH_SEED", "42").toLong
    val shrink = sys.env.getOrElse("REFINE_SHRINK", "8.0").toDouble
    val cv = 3

    val baseHypers = RandomSearch.hyperSequence(nBase, seed)
    val res = RandomSearch.replayRefined(baseHypers,
      RefineTrials.dense(byTrial, nBase + rounds * perRound),
      rounds, perRound, cv, seed, shrink = shrink)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("BREADTH_MASTER", "local[12]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val prep = pipeline.SimulationRun.prepare(spark,
      s"$dataDir/miRNA_seq_${dataset}_diff.csv")
    val mkArch = pipeline.ArchFamilies(arch)

    val h = res.best.hypers
    println(s"[rcombine] best_trial=${res.best.trial} " +
      f"best_cv_loss=${res.best.avgLoss}%.4f lr=${h.lr}%.6g " +
      f"l2=${h.l2}%.6g batch=${h.batchSize} epochs=${h.epochs} " +
      f"ortho=${h.orthoMultiplier}%.6g")
    val ev = pipeline.SimulationRun.evalBest(prep, mkArch, h, epochScale)
    val nbAcc = ev.nbCv.agg(avg("accuracy")).head().getDouble(0)
    println("[rcombine] best_trial,best_cv_loss,recon_mean,recon_std," +
      "nb_acc_mean,test_recon_mean,test_recon_std")
    println(f"[rcombine] ${res.best.trial},${res.best.avgLoss}%.4f," +
      f"${ev.reconStats._1}%.4f,${ev.reconStats._2}%.4f,$nbAcc%.4f," +
      f"${ev.testReconStats._1}%.4f,${ev.testReconStats._2}%.4f")
    spark.stop()
  }
}
