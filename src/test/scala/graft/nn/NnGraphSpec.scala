package graft.nn

import breeze.linalg.DenseMatrix
import graft.SparkSpec

/** Finite-difference validation of the graph engine across ALL 8
  * reference architectures (at the published hidden dims, small input
  * widths) — every loss term (recon, O1/O2/O3 ortho, NT-Xent) and every
  * layer type goes through the check, dropout masks active.
  */
class NnGraphSpec extends SparkSpec {

  private def randMat(rows: Int, cols: Int, seed: Int): DenseMatrix[Double] = {
    val rng = new java.util.Random(seed)
    DenseMatrix.tabulate(rows, cols)((_, _) => rng.nextDouble())
  }

  private def gradCheck(name: String, model: GraphModel,
      nProbes: Int = 12): Unit = {
    val (params, stats) = model.initParams(seed = 5)
    val x1 = randMat(6, 6, 11)
    val x2 = randMat(6, 4, 13)
    def loss(p: Array[Double]): Double =
      model.batchGradient(p, stats, x1, x2, new java.util.Random(7)).loss
    val analytic = model.batchGradient(params, stats, x1, x2,
      new java.util.Random(7)).grads
    val h = 1e-6
    val rng = new java.util.Random(3)
    var checked = 0
    var failures = List.empty[String]
    while (checked < nProbes) {
      val i = rng.nextInt(model.paramCount)
      val pPlus = params.clone(); pPlus(i) += h
      val pMinus = params.clone(); pMinus(i) -= h
      val numeric = (loss(pPlus) - loss(pMinus)) / (2 * h)
      val scale = math.abs(numeric) + math.abs(analytic(i))
      if (scale > 1e-7) { // skip dead units (dropout/relu zeroed paths)
        checked += 1
        val rel = math.abs(numeric - analytic(i)) / math.max(scale, 1e-4)
        if (rel > 1e-4)
          failures ::= f"$name param $i: num=$numeric%.8g ana=${analytic(i)}%.8g"
      } else checked += 1
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  describe("ArchZoo gradient checks (M14/M15/M16/M20/M21)") {
    it("CNC_AE")    { gradCheck("cnc", ArchZoo.cnc(6, 4).model) }
    it("X_AE")      { gradCheck("xae", ArchZoo.xae(6, 4).model) }
    it("MM_AE")     { gradCheck("mm", ArchZoo.mm(6, 4).model) }
    it("JISAE")     { gradCheck("jisae", ArchZoo.jisae(6, 4).model) }
    it("JISAE-O1")  { gradCheck("o1", ArchZoo.jisaeO1(6, 4, 0.5).model) }
    it("JISAE-O2")  { gradCheck("o2", ArchZoo.jisaeO2(6, 4, 0.5).model) }
    it("JISAE-O3")  { gradCheck("o3", ArchZoo.jisaeO3(6, 4, 0.5).model) }
    it("MOCSS (incl. NT-Xent)") { gradCheck("mocss",
      ArchZoo.mocss(6, 4, 0.7).model) }
  }

  describe("Graph training end-to-end") {
    lazy val data: org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val rng = new java.util.Random(42)
      (0 until 48).map { i =>
        val f = Array(rng.nextDouble(), rng.nextDouble())
        val x1 = Array.tabulate(6)(j => f(j % 2) * (j + 1) / 6.0 +
          rng.nextGaussian() * 0.01)
        val x2 = Array.tabulate(4)(j => f((j + 1) % 2) * (j + 1) / 4.0 +
          rng.nextGaussian() * 0.01)
        (s"s$i", x1.toSeq, x2.toSeq)
      }.toDF("sample_id", "x1", "x2")
    }

    it("JISAE-O1 graph model trains, embeds (z1||z2||z12), evaluates") {
      val arch = ArchZoo.jisaeO1(6, 4, orthoMultiplier = 0.1)
      val t = Trainer.train(data, arch.model,
        Trainer.Config(lr = 1e-3, batchSize = 24, epochs = 3, seed = 21))
      assert(t.epochLosses.forall(l => !l.isNaN && !l.isInfinite))
      val inf = Inference.embedAndRecon(data, arch.model, t.params,
        t.stats, arch.embed)
      val rows = inf.select("embedding", "recon_loss").collect()
      // SS embed = z1(1024) ‖ z2(1024) ‖ z12(1024)
      assert(rows.forall(_.getSeq[Double](0).length == 3072))
      assert(rows.forall(_.getDouble(1) >= 0))
      val l = Trainer.evaluateLoss(data, arch.model, t.params, t.stats)
      assert(l > 0 && !l.isNaN)
    }

    it("trainSync (treeAggregate path) converges and is deterministic") {
      val ae = TwoViewAe.cncSized(6, 4, hidden = Seq(8), embed = 3)
      val cfg = Trainer.Config(lr = 1e-2, weightDecay = 1e-6,
        batchSize = 0 /* unused in sync mode */, epochs = 14, seed = 21)
      val t1 = Trainer.trainSync(data, Trainer.TwoViewModel(ae), cfg)
      val first3 = t1.epochLosses.take(3).sum / 3
      val last3 = t1.epochLosses.takeRight(3).sum / 3
      assert(last3 < first3,
        s"sync loss did not fall: ${t1.epochLosses.mkString(", ")}")
      assert(t1.epochLosses.forall(l => !l.isNaN && !l.isInfinite))
      // first-epoch loss is deterministic (same init + per-partition
      // seeds); later epochs drift at FP level because treeReduce's
      // gradient-summation order varies — inherent to synchronous
      // data-parallel reduction (same as Spark ML's treeAggregate).
      val t2 = Trainer.trainSync(data, Trainer.TwoViewModel(ae), cfg)
      assert(math.abs(t1.epochLosses.head - t2.epochLosses.head) < 1e-12)
    }

    it("chunked gradient reduction matches the unchunked first epoch") {
      val ae = TwoViewAe.cncSized(6, 4, hidden = Seq(8), embed = 3)
      val cfg = Trainer.Config(lr = 1e-2, weightDecay = 1e-6,
        batchSize = 0, epochs = 6, seed = 21)
      val whole = Trainer.trainSync(data, Trainer.TwoViewModel(ae), cfg)
      val chunked = Trainer.trainSync(data, Trainer.TwoViewModel(ae), cfg,
        gradChunks = 7)
      // forward pass from identical init → identical first-epoch loss;
      // later epochs drift at FP level (reduction order)
      assert(math.abs(whole.epochLosses.head - chunked.epochLosses.head)
        < 1e-12)
      assert(chunked.epochLosses.last < chunked.epochLosses.head)
    }

    it("auto gradient slicing bounds in-flight bytes at the search maximum") {
      // SURVEY §4.4: the random-search width maximum is ~45 M params —
      // the slice rule must keep every reduction operand within the
      // declared byte bound, for that width and any other
      for (p <- Seq(1L, 1000L, 8_388_608L, 45_000_000L, 200_000_000L)) {
        val chunks = Trainer.gradChunksFor(p)
        val sliceLen = (p + chunks - 1) / chunks
        assert(sliceLen * 8 <= Trainer.DefaultGradSliceBytes,
          s"paramCount=$p: slice ${sliceLen * 8} B > bound")
        // no over-slicing: one fewer chunk would break the bound
        if (chunks > 1)
          assert((p + chunks - 2) / (chunks - 1) * 8
            > Trainer.DefaultGradSliceBytes, s"paramCount=$p over-sliced")
      }
      assert(Trainer.gradChunksFor(45_000_000L) == 6)
      // the REAL widest family at the exact TCGA widths: MOCSS at
      // (20531, 1046) is 97.2 M params — auto-slicing must engage with
      // 12 slices of <= 64 MiB (GradSliceProof measured the bound:
      // sliced completes at -Xmx8g where the monolithic reduce OOMs)
      val mocss = graft.nn.ArchZoo.mocss(20531, 1046, 1.0).model
      assert(mocss.paramCount == 97_169_042L, s"=${mocss.paramCount}")
      val tcgaChunks = Trainer.gradChunksFor(mocss.paramCount)
      assert(tcgaChunks == 12)
      assert((mocss.paramCount + tcgaChunks - 1) / tcgaChunks * 8
        <= Trainer.DefaultGradSliceBytes)
      // a genuinely-wide layer driven through the AUTO path: a tiny
      // slice budget forces many sequential slice reductions, and the
      // result still matches the whole-gradient first epoch exactly
      val wide = TwoViewAe.cncSized(6, 4, hidden = Seq(64), embed = 3)
      val cfg = Trainer.Config(lr = 1e-2, weightDecay = 1e-6,
        batchSize = 0, epochs = 2, seed = 21)
      val model = Trainer.TwoViewModel(wide)
      val budget = 1024L // bytes → 128 doubles per slice
      assert(Trainer.gradChunksFor(model.paramCount, budget) > 5)
      val sliced = Trainer.trainSync(data, model, cfg,
        maxGradSliceBytes = budget)
      val whole = Trainer.trainSync(data, model, cfg, gradChunks = 1)
      assert(math.abs(sliced.epochLosses.head - whole.epochLosses.head)
        < 1e-12)
    }

    it("MOCSS graph model trains and embeds (spec1||spec2||avg shared)") {
      val arch = ArchZoo.mocss(6, 4, reconMultiplier = 0.7)
      val t = Trainer.train(data, arch.model,
        Trainer.Config(lr = 1e-3, batchSize = 24, epochs = 2, seed = 21))
      assert(t.epochLosses.forall(l => !l.isNaN))
      val inf = Inference.embedAndRecon(data, arch.model, t.params,
        t.stats, arch.embed)
      val rows = inf.select("embedding", "recon_loss").collect()
      assert(rows.forall(_.getSeq[Double](0).length == 96)) // 32+32+32
      assert(rows.forall(_.getDouble(1) >= 0))
    }
  }
}
