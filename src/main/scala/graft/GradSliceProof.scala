package graft

import java.lang.management.ManagementFactory
import org.apache.spark.sql.SparkSession

/** Isolated driver-memory proof for the sliced gradient reduction
  * (dev driver, VERDICT r7 item 2).
  *
  * `TcgaScaleProof` records ~9.2 GB peak heap at TCGA width, but in
  * local mode that number fuses executors and driver, so it cannot
  * falsify (or confirm) SURVEY §4.4's 8 GiB DRIVER budget. This driver
  * isolates the variable that matters — the reduction's transient — by
  * running the SAME model, data and epoch twice in one JVM and
  * comparing measured peaks:
  *
  *   1. sliced  (gradChunks auto → 64 MiB slices, the cluster default)
  *   2. whole   (gradChunks = 1 — the monolithic treeReduce this
  *              engine refuses to default to)
  *
  * at the widest architecture of the 8-family zoo instantiated at the
  * exact TCGA widths (d1=20531, d2=1046) — MOCSS, 97.2 M params, a
  * 741 MiB monolithic gradient — on a deliberately tiny row count so
  * the model state, not the data, dominates the heap. A background
  * thread samples `MemoryMXBean.getHeapMemoryUsage` every 5 ms.
  *
  * Model-INHERENT driver state at this width is ~3.9 GB (params +
  * Adam m/v + gradient target + broadcast copy) — no reduction
  * strategy changes that. What slicing controls is the transient ON
  * TOP; so the proof is two separate JVMs:
  *
  *   java -Xmx6g  -cp <cp> graft.GradSliceProof 48 2 sliced
  *     → the cluster-default path COMPLETES inside SURVEY §4.4's
  *       8 GiB driver budget with 2 GiB to spare (hard cap, not a
  *       reading)
  *   java -Xmx12g -cp <cp> graft.GradSliceProof 48 2 both
  *     → same epoch, sliced vs monolithic peaks side by side
  *
  * The committed run log lives in SCALE.md §TCGA-shape.
  */
object GradSliceProof {

  private final class Poller extends Thread {
    @volatile var peak = 0L
    @volatile private var stopped = false
    setDaemon(true)
    private val bean = ManagementFactory.getMemoryMXBean
    override def run(): Unit =
      while (!stopped) {
        peak = math.max(peak, bean.getHeapMemoryUsage.getUsed)
        Thread.sleep(5)
      }
    def reset(): Unit = { peak = 0L }
    def halt(): Unit = { stopped = true }
  }

  private def gc(): Unit = { System.gc(); Thread.sleep(200); System.gc() }

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(48)
    val parts = args.lift(1).map(_.toInt).getOrElse(2)
    val mode = args.lift(2).getOrElse("both") // sliced | whole | both
    val (d1, d2) = (20531, 1046) // exact TCGA widths
    val spark = Sessions.builder(s"local[$parts]", parts.toString).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the widest family at TCGA width is the per-model search maximum
    // the 64 MiB slice rule exists for
    val zoo: Seq[(String, nn.ArchZoo.Arch)] = Seq(
      "CNC_AE" -> nn.ArchZoo.cnc(d1, d2),
      "X_AE" -> nn.ArchZoo.xae(d1, d2),
      "MM_AE" -> nn.ArchZoo.mm(d1, d2),
      "JISAE" -> nn.ArchZoo.jisae(d1, d2),
      "JISAE-O1" -> nn.ArchZoo.jisaeO1(d1, d2, 1.0),
      "MOCSS" -> nn.ArchZoo.mocss(d1, d2, 1.0))
    zoo.foreach { case (n, a) =>
      println(f"[gsp] $n%-9s paramCount=${a.model.paramCount}%,d") }
    val (archName, arch) = zoo.maxBy(_._2.model.paramCount)
    val model = arch.model
    val p = model.paramCount
    val chunks = nn.Trainer.gradChunksFor(p)
    val sliceBytes = (p + chunks - 1) / chunks * 8
    println(f"[gsp] widest=$archName params=$p%,d (${p * 8 / (1 << 20)} MiB" +
      f" monolithic) → $chunks slices × ${sliceBytes / (1 << 20)} MiB")
    require(chunks > 1, "TCGA width must engage slicing")

    // deterministic tiny batch: model state dominates, data is noise
    def cell(r: Int, j: Int): Double =
      (((r * 2654435761L + j * 40503L) % 1000) + 1000) % 1000 / 1000.0
    val data = (0 until rows).map { r =>
      (Array.tabulate(d1)(cell(r, _)), Array.tabulate(d2)(j => cell(r, d1 + j)))
    }.toDF("x1", "x2").repartition(parts).cache()
    data.count()

    val cfg = nn.Trainer.Config(lr = 1e-3, weightDecay = 1e-6,
      batchSize = 0, epochs = 1, seed = 7)
    val poller = new Poller; poller.start()

    def phase(name: String, gradChunks: Int): (Double, Long) = {
      gc(); poller.reset()
      val t0 = System.nanoTime()
      val out = nn.Trainer.trainSync(data, model, cfg, gradChunks = gradChunks)
      val secs = (System.nanoTime() - t0) / 1e9
      val pk = poller.peak
      println(f"[gsp] $name%-7s loss=${out.epochLosses.head}%.4f " +
        f"peak=${pk / 1e9}%.2f GB wall=$secs%.0f s")
      (out.epochLosses.head, pk)
    }

    // sliced FIRST so its peak cannot benefit from memory the whole
    // phase already forced the JVM to commit
    val xmx = Runtime.getRuntime.maxMemory / 1e9
    mode match {
      case "sliced" =>
        val (_, pk) = phase("sliced", 0)
        println(f"[gsp] RESULT sliced=${pk / 1e9}%.2f GB under " +
          f"xmx=$xmx%.2f GB — cluster path fits the capped driver")
      case "whole" =>
        val (_, pk) = phase("whole", 1)
        println(f"[gsp] RESULT whole=${pk / 1e9}%.2f GB under " +
          f"xmx=$xmx%.2f GB")
      case _ =>
        val (l1, peakSliced) = phase("sliced", 0)
        val (l2, peakWhole) = phase("whole", 1)
        require(math.abs(l1 - l2) < 1e-12,
          s"sliced/whole first-epoch divergence: $l1 vs $l2")
        println(f"[gsp] RESULT sliced=${peakSliced / 1e9}%.2f GB " +
          f"whole=${peakWhole / 1e9}%.2f GB xmx=$xmx%.2f GB " +
          f"slice_transient<=${2 * sliceBytes / (1 << 20)} MiB/merge")
    }
    poller.halt()
    spark.stop()
  }
}
