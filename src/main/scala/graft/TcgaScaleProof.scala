package graft

import java.io.{BufferedWriter, FileWriter}
import java.lang.management.{ManagementFactory, MemoryType}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** TCGA-shape scale proof (dev driver, VERDICT r6 item 4).
  *
  * The reference's real matrices (`TCGA_Data/combined_exp_df.csv`,
  * 1866×20531; `combined_miRNA_df.csv`, 1866×1046) are git-LFS pointers
  * in this environment, so the published golden tables can't be replayed
  * on real values. What CAN be proven is the engine at the exact
  * reference SHAPE: this driver synthesizes deterministic TSVs at the
  * real widths with the REAL class distribution (labels.csv is present:
  * breast 621, lung 341, melanoma 97, liver 367, sarcoma 257, kidney
  * 183 = 1866), then runs the full TcgaEval pipeline — samples-as-rows
  * ingest (20531-wide array column), positional label alignment,
  * stratified 80/20 split (must yield the published 1494/372 exactly),
  * per-split min-max scaling, CNC_AE training (~17.8 M params — the
  * width class the §4.4 gradient-sharding bound exists for), per-split
  * recon stats, and GaussianNB 5-fold CV on embeddings.
  *
  * Emits per-stage wall-clock and peak JVM heap; the committed run log
  * lives in SCALE.md §"TCGA-shape proof".
  */
object TcgaScaleProof {

  // real per-class counts from TCGA_Data/labels.csv (file order)
  private val classBlocks: Seq[(String, Int)] = Seq(
    "breast" -> 621, "kidney" -> 183, "liver" -> 367,
    "lung" -> 341, "melanoma" -> 97, "sarcoma" -> 257)

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** One samples-as-rows TSV at (1866 × width): header row with an empty
    * leading cell (pandas index style → Spark names it `_c0`), cell
    * values deterministic in [0,1) from a (row, col) hash plus a small
    * class-dependent mean shift so the NB stage has real signal. */
  private def writeMatrix(path: String, width: Int, seed: Long): Unit = {
    val w = new BufferedWriter(new FileWriter(path), 1 << 22)
    try {
      val sb = new java.lang.StringBuilder(width * 7 + 16)
      for (j <- 0 until width) sb.append('\t').append('g').append(j)
      w.write(sb.toString); w.newLine()
      var row = 0
      for ((cls, n) <- classBlocks; _ <- 0 until n) {
        val cIdx = classBlocks.indexWhere(_._1 == cls)
        sb.setLength(0)
        sb.append('S').append(cls).append('_').append(row)
        var j = 0
        while (j < width) {
          val h = splitmix64(seed ^ (row.toLong << 32) ^ j)
          var v = (((h % 10000) + 10000) % 10000).toInt // 0..9999
          if (j % 50 == cIdx) v = math.min(9999, v + 3000) // class signal
          sb.append("\t0.")
          sb.append(('0' + v / 1000).toChar); v %= 1000
          sb.append(('0' + v / 100).toChar); v %= 100
          sb.append(('0' + v / 10).toChar)
          sb.append(('0' + v % 10).toChar)
          j += 1
        }
        w.write(sb.toString); w.newLine()
        row += 1
      }
    } finally w.close()
  }

  private def writeLabels(path: String): Unit = {
    val w = new BufferedWriter(new FileWriter(path))
    try {
      w.write("0"); w.newLine()
      for ((cls, n) <- classBlocks; _ <- 0 until n) {
        w.write(s"Primary Tumor*$cls"); w.newLine()
      }
    } finally w.close()
  }

  private def peakHeapMb: Long = ManagementFactory.getMemoryPoolMXBeans
    .asScala.filter(_.getType == MemoryType.HEAP)
    .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
    .sum >> 20

  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(2)
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_tcga_shape")
    dir.mkdirs()
    val (expP, mirP, labP) = (new java.io.File(dir, "exp.tsv"),
      new java.io.File(dir, "mirna.tsv"), new java.io.File(dir, "labels.tsv"))

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[tcga-shape] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        s" (peak heap ${peakHeapMb} MB)")
      r
    }

    timed("synthesize 1866x20531 + 1866x1046 TSVs") {
      if (!expP.exists()) writeMatrix(expP.getPath, 20531, seed = 42)
      if (!mirP.exists()) writeMatrix(mirP.getPath, 1046, seed = 1337)
      if (!labP.exists()) writeLabels(labP.getPath)
    }
    println(s"[tcga-shape] exp=${expP.length() >> 20} MB, " +
      s"mirna=${mirP.length() >> 20} MB")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val res = timed("TcgaEval end-to-end (ingest→split→scale→CNC_AE" +
      s"→recon→NB, $epochs epochs)") {
      graft.pipeline.TcgaEval.run(spark, expP.getPath, mirP.getPath,
        labP.getPath, (d1, d2) => graft.nn.ArchZoo.cnc(d1, d2),
        epochs = epochs, batchSize = 128)
    }
    println(s"[tcga-shape] train/test = ${res.trainCount}/${res.testCount}")
    require(res.trainCount == 1494 && res.testCount == 372,
      s"split must reproduce the published 1494/372 at the real class " +
        s"distribution, got ${res.trainCount}/${res.testCount}")
    res.reconTable.collect().foreach(r => println(s"[tcga-shape] recon $r"))
    res.nbTable.collect().foreach(r => println(s"[tcga-shape] nb $r"))
    println(s"[tcga-shape] final peak heap: ${peakHeapMb} MB")
    spark.stop()
  }
}
