package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.search.RandomSearch

/** Worker for the full-breadth (reference-scale, 50-trial) search
  * convergence measurement (QUALITY_r10): computes the CV fold losses
  * of an arbitrary SUBSET of the trials a sequential
  * `RandomSearch.search(seed=42)` run would execute.
  *
  * Why this is sound: trial t's hypers are a pure function of
  * (seed, t) (`RandomSearch.hyperSequence`), and at cv=3 with
  * warmupSteps=2 the MedianPruner only marks a trial AFTER its last
  * fold has trained — it never truncates work — so every trial's fold
  * losses are independent of every other trial. The only sequential
  * state (pruning history, best selection) is replayed exactly by
  * `RandomSearch.replay` in `BreadthCombine`. `BreadthReplaySpec` pins
  * the replay == live-search equivalence.
  *
  * Usage:
  *   runMain graft.BreadthTrials plan <nTotal> <epochScale>
  *   runMain graft.BreadthTrials run <nTotal> <epochScale> <arch> \
  *     <dataset e.g. 3_groups_1> <trialsCsv e.g. 0,7,13>
  * Output lines: [btrial] t=<i> losses=<l0>,<l1>,<l2> secs=<s>
  * (losses printed via Double.toString — exact round-trip).
  */
object BreadthTrials {

  private val dataDir = "/root/reference/Simulation_Data"

  def main(args: Array[String]): Unit = {
    val cmd = args(0)
    val nTotal = args(1).toInt
    val epochScale = args(2).toDouble
    // BREADTH_SEED: seed-replication knob for the floor claim (the
    // search contract itself stays seed-42; a second seed measures the
    // floor's sampling variance, QUALITY_r10)
    val seed = sys.env.getOrElse("BREADTH_SEED", "42").toLong
    val hypers = RandomSearch.hyperSequence(nTotal, seed)

    if (cmd == "plan") {
      hypers.zipWithIndex.foreach { case (h, t) =>
        val epochs = math.max(1, math.round(h.epochs * epochScale).toInt)
        println(f"[bplan] t=$t epochs=$epochs batch=${h.batchSize} " +
          f"lr=${h.lr}%.6g l2=${h.l2}%.6g ortho=${h.orthoMultiplier}%.6g")
      }
      return
    }

    require(cmd == "run", s"unknown cmd $cmd")
    val arch = args(3)
    val dataset = args(4)
    val trials = args(5).split(",").map(_.toInt).toSeq
    // BREADTH_CV: fold-count knob (QUALITY_r11 cv=5 confirmation — the
    // reference searches with Objective_CV(cv=5); the engine contract
    // is cv=3. Replay is cv-agnostic, so a cv=5 worker wave + cv=5
    // replay IS a full-fidelity cv=5 search of the same trial sequence)
    val cv = sys.env.getOrElse("BREADTH_CV", "3").toInt

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
      val h = hypers(t)
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
      // cv recorded per line so BreadthCombine can refuse a mismatched
      // replay (ADVICE r11: a cv=5 wave combined without BREADTH_CV
      // set would silently replay cv=3 over 5-fold vectors)
      println(s"[btrial] t=$t cv=$cv losses=${losses.mkString(",")} " +
        f"secs=$secs%.0f")
    }
    spark.stop()
    println("[btrial] WORKER DONE")
  }
}

/** Combiner: replays the sequential search over worker-computed fold
  * losses at each requested breadth prefix (a prefix replay IS a
  * standalone nTrials=P run — same hypers, same pruning decisions),
  * then retrains + evaluates the best trial of each prefix through the
  * same §3.2/§3.3 path as `SimulationRun.run`.
  *
  * Usage: runMain graft.BreadthCombine <nTotal> <epochScale> <arch> \
  *   <dataset> <prefixesCsv e.g. 8,16,32,50> <lossFile>
  * lossFile lines: "t=<i> losses=<l0>,<l1>,<l2>" (as [btrial] prints).
  */
object BreadthCombine {

  private val dataDir = "/root/reference/Simulation_Data"

  def main(args: Array[String]): Unit = {
    val nTotal = args(0).toInt
    val epochScale = args(1).toDouble
    val arch = args(2)
    val dataset = args(3)
    val prefixes = args(4).split(",").map(_.toInt).toSeq
    val lossFile = args(5)
    val seed = sys.env.getOrElse("BREADTH_SEED", "42").toLong
    val cv = sys.env.getOrElse("BREADTH_CV", "3").toInt

    // `cv=` is optional for pre-r12 loss files; when present it must
    // match BREADTH_CV, and every loss vector must have exactly cv
    // folds — a cv=5 wave combined in a shell without BREADTH_CV set
    // would otherwise silently replay cv=3 over 5-fold vectors and
    // select a different best trial (ADVICE r11)
    val rx = """t=(\d+) (?:cv=(\d+) )?losses=([0-9eE+\-.,NaN]+)""".r.unanchored
    val byTrial = scala.io.Source.fromFile(lossFile).getLines()
      .collect { case rx(t, cvTag, ls) =>
        if (cvTag != null) require(cvTag.toInt == cv,
          s"loss file trial $t was computed at cv=$cvTag but " +
            s"BREADTH_CV=$cv — refusing a mismatched replay")
        val v = ls.split(",").map(_.toDouble).toSeq
        require(v.length == cv,
          s"loss file trial $t has ${v.length} fold losses, expected " +
            s"cv=$cv — set BREADTH_CV to the wave's fold count")
        t.toInt -> v }
      .toMap
    val hypers = RandomSearch.hyperSequence(nTotal, seed)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("BREADTH_MASTER", "local[12]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val prep = pipeline.SimulationRun.prepare(spark,
      s"$dataDir/miRNA_seq_${dataset}_diff.csv")
    val mkArch = pipeline.ArchFamilies(arch)

    println("[bcombine] prefix,best_trial,best_cv_loss,recon_mean," +
      "recon_std,nb_acc_mean,test_recon_mean,test_recon_std")
    val evalCache = scala.collection.mutable.Map
      .empty[Int, pipeline.SimulationRun.EvalResult]
    for (p <- prefixes) {
      val have = (0 until p).filter(byTrial.contains)
      if (have.length < p) {
        println(s"[bcombine] prefix=$p SKIPPED: have only " +
          s"${have.length}/$p trial losses (missing " +
          s"${(0 until p).filterNot(byTrial.contains).mkString(",")})")
      } else {
        val res = RandomSearch.replay(hypers.take(p),
          (0 until p).map(byTrial), cv = cv)
        val ev = evalCache.getOrElseUpdate(res.best.trial,
          pipeline.SimulationRun.evalBest(prep, mkArch,
            res.best.hypers, epochScale))
        val nbAcc = ev.nbCv.agg(avg("accuracy")).head().getDouble(0)
        println(f"[bcombine] $p,${res.best.trial},${res.best.avgLoss}%.4f," +
          f"${ev.reconStats._1}%.4f,${ev.reconStats._2}%.4f,$nbAcc%.4f," +
          f"${ev.testReconStats._1}%.4f,${ev.testReconStats._2}%.4f")
      }
    }
    spark.stop()
  }
}
