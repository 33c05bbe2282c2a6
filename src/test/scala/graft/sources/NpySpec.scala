package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S6 — `.npy` matrix scans as a splittable DataSource V2. Fixtures are
  * written by a spec-local NumPy-format writer (header spec is public:
  * magic, v1 LE header length, Python dict literal, C-order records). */
class NpySpec extends SparkSpec {

  private def writeNpy(path: String, descr: String, shape: Seq[Long],
      put: ByteBuffer => Unit, dataBytes: Int,
      fortran: Boolean = false): Unit = {
    val shapeStr = if (shape.length == 1) s"(${shape.head},)"
                   else s"(${shape.mkString(", ")})"
    val dict = s"{'descr': '$descr', 'fortran_order': " +
      s"${if (fortran) "True" else "False"}, 'shape': $shapeStr, }"
    // pad header so that magic(6)+ver(2)+len(2)+dict is 64-aligned
    val base = 10 + dict.length + 1
    val pad = (64 - base % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = new DataOutputStream(new FileOutputStream(path))
    out.write(0x93); out.write("NUMPY".getBytes(StandardCharsets.US_ASCII))
    out.write(1); out.write(0)
    out.write(header.length & 0xFF); out.write((header.length >> 8) & 0xFF)
    out.write(header.getBytes(StandardCharsets.US_ASCII))
    val bb = ByteBuffer.allocate(dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    put(bb)
    out.write(bb.array()); out.close()
  }

  private lazy val dir = Files.createTempDirectory("npy_spec").toString

  it("reads a float64 matrix with exact values and row indexing") {
    val rows = 7; val cols = 3
    val expect = Array.tabulate(rows, cols)((r, c) => r * 10.0 + c + 0.25)
    writeNpy(s"$dir/f8.npy", "<f8", Seq(rows, cols),
      bb => expect.flatten.foreach(bb.putDouble), rows * cols * 8)
    val df = spark.read.format("npy").load(s"$dir/f8.npy")
    assert(df.schema.fieldNames.toSeq == Seq("row_idx", "values"))
    val got = df.orderBy("row_idx").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    assert(got.map(_._1).toSeq == (0L until rows))
    got.foreach { case (r, vs) => assert(vs.sameElements(expect(r.toInt))) }
  }

  it("reads int32 and 1-D arrays (as n x 1), cast to double") {
    writeNpy(s"$dir/i4.npy", "<i4", Seq(4, 2),
      bb => (1 to 8).foreach(bb.putInt), 32)
    val i4 = spark.read.format("npy").load(s"$dir/i4.npy")
      .orderBy("row_idx").collect().map(_.getSeq[Double](1).toSeq)
    assert(i4.toSeq == Seq(Seq(1.0, 2.0), Seq(3.0, 4.0),
      Seq(5.0, 6.0), Seq(7.0, 8.0)))
    writeNpy(s"$dir/one_d.npy", "<f8", Seq(3),
      bb => Seq(1.5, 2.5, 3.5).foreach(bb.putDouble), 24)
    val d1 = spark.read.format("npy").load(s"$dir/one_d.npy")
      .orderBy("row_idx").collect().map(_.getSeq[Double](1).toSeq)
    assert(d1.toSeq == Seq(Seq(1.5), Seq(2.5), Seq(3.5)))
  }

  it("splits one file into row-range partitions that tile exactly") {
    val rows = 103; val cols = 5
    writeNpy(s"$dir/big.npy", "<f8", Seq(rows, cols),
      bb => (0 until rows * cols).foreach(i => bb.putDouble(i.toDouble)),
      rows * cols * 8)
    val df = spark.read.format("npy").option("numPartitions", "7")
      .load(s"$dir/big.npy")
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == rows)
    // spot-check a row that lives in a later partition: values are
    // row-major consecutive doubles
    val r77 = df.filter(col("row_idx") === 77).head().getSeq[Double](1)
    assert(r77.toSeq == (77 * cols until 78 * cols).map(_.toDouble))
  }

  it("reads a directory of shards as one matrix with continuing row_idx") {
    val shardDir = Files.createTempDirectory("npy_shards").toString
    writeNpy(s"$shardDir/part-000.npy", "<f8", Seq(2, 2),
      bb => Seq(1.0, 2.0, 3.0, 4.0).foreach(bb.putDouble), 32)
    writeNpy(s"$shardDir/part-001.npy", "<f8", Seq(3, 2),
      bb => Seq(5.0, 6.0, 7.0, 8.0, 9.0, 10.0).foreach(bb.putDouble), 48)
    val df = spark.read.format("npy").load(shardDir)
      .orderBy("row_idx").collect()
    assert(df.map(_.getLong(0)).toSeq == (0L until 5L))
    assert(df.last.getSeq[Double](1).toSeq == Seq(9.0, 10.0))
  }

  it("prunes the values column: count() decodes no data bytes") {
    val df = spark.read.format("npy").load(s"$dir/big.npy")
    assert(df.count() == 103)
    val plan = df.select("row_idx").queryExecution.executedPlan.toString
    assert(plan.contains("required=row_idx"), plan)
  }

  it("rejects fortran order and unknown dtypes with clear errors") {
    writeNpy(s"$dir/fortran.npy", "<f8", Seq(2, 2),
      bb => (1 to 4).foreach(i => bb.putDouble(i)), 32, fortran = true)
    val e1 = intercept[Exception] {
      spark.read.format("npy").load(s"$dir/fortran.npy").collect()
    }
    assert(e1.getMessage.contains("fortran_order"))
    writeNpy(s"$dir/c16.npy", "<c16", Seq(1, 1), bb => {
      bb.putDouble(0.0); bb.putDouble(0.0)
    }, 16)
    val e2 = intercept[Exception] {
      spark.read.format("npy").load(s"$dir/c16.npy").collect()
    }
    assert(e2.getMessage.contains("unsupported npy dtype"))
  }
}
