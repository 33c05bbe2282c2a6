package graft.pipeline

import graft.SparkSpec

/** FIXTURES.md §1.2 — synthetic TCGA-shaped fixture: 60 samples ×
  * (24 "genes" + 12 "miRNAs"), 6 classes × 10, seeded; TSV files in the
  * reference's on-disk layout (samples-as-rows with an id column,
  * positional labels.csv with header `0`). The real TCGA CSVs are
  * LFS-missing in the checkout.
  */
class TcgaEvalSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-tcga")
    val rng = new java.util.Random(2023)
    val classes = Seq("breast", "lung", "melanoma", "liver", "sarcoma",
      "kidney")
    val samples = (0 until 60).map { i =>
      val cls = classes(i / 10)
      (f"TCGA-$i%02d", cls, i / 10)
    }
    def writeMatrix(name: String, width: Int): Unit = {
      val header = ("" +: (0 until width).map(j => s"g$j")).mkString("\t")
      val rows = samples.map { case (sid, _, cIdx) =>
        val vals = (0 until width).map { j =>
          val base = if (j % 6 == cIdx) 5.0 else 1.0
          base + rng.nextGaussian() * 0.3
        }
        (sid +: vals.map(v => f"$v%.4f")).mkString("\t")
      }
      java.nio.file.Files.writeString(d.resolve(name),
        (header +: rows).mkString("\n"))
    }
    writeMatrix("exp.tsv", 24)
    writeMatrix("mirna.tsv", 12)
    val labelLines = "0" +: samples.map { case (_, cls, _) =>
      s"Primary Tumor*$cls" }
    java.nio.file.Files.writeString(d.resolve("labels.tsv"),
      labelLines.mkString("\n"))
    d
  }

  describe("TcgaEval (SURVEY §3.3 on the FIXTURES §1.2 fixture)") {
    it("produces the cells 68/78-79/124-shaped outputs") {
      val res = TcgaEval.run(spark,
        dir.resolve("exp.tsv").toString,
        dir.resolve("mirna.tsv").toString,
        dir.resolve("labels.tsv").toString,
        (d1, d2) => graft.nn.ArchZoo.cnc(d1, d2),
        epochs = 2, batchSize = 32, lr = 1e-3)

      // cell 68 analog: exact 80/20 stratified counts
      assert(res.trainCount == 48 && res.testCount == 12)

      val recon = res.reconTable.collect()
        .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
      assert(recon.map(_._1).toSet == Set("train", "test"))
      assert(recon.forall { case (_, m, s) => m > 0 && s >= 0 })

      // 12 test samples / 6 strata: only folds 0-1 are populated
      val nb = res.nbTable.collect()
      assert(nb.length == 2)
      assert(nb.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    }
  }
}
