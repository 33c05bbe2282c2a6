package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Extended-S6 — MAT-v5 numeric-matrix scans as a DataSource V2
  * (`Simulation_Auxiliary/mocss.py:376-383`'s `scio.loadmat` input).
  * Fixtures are written by a spec-local MAT-File Level 5 writer
  * (public format: 128-byte header, tagged elements, column-major
  * data, optional per-variable zlib). */
class MatSpec extends SparkSpec {

  /** One miMATRIX element for a real 2-D matrix, column-major data. */
  private def matrixElement(name: String, rows: Int, cols: Int,
      matType: Int, itemSize: Int, clazz: Int,
      put: (ByteBuffer, Int, Int) => Unit): Array[Byte] = {
    def pad8(n: Int): Int = (n + 7) & ~7
    val nameBytes = name.getBytes(StandardCharsets.US_ASCII)
    val namePart =
      if (nameBytes.length <= 4) 8 // small element
      else 8 + pad8(nameBytes.length)
    val dataLen = rows * cols * itemSize
    val payload = 16 + 16 + namePart + 8 + pad8(dataLen)
    val bb = ByteBuffer.allocate(8 + payload)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(14).putInt(payload) // miMATRIX
    bb.putInt(6).putInt(8).putInt(clazz).putInt(0) // array flags
    bb.putInt(5).putInt(8).putInt(rows).putInt(cols) // dims (miINT32)
    if (nameBytes.length <= 4) { // small name element
      bb.putShort(1.toShort).putShort(nameBytes.length.toShort)
      bb.put(nameBytes)
      bb.position(bb.position() + (4 - nameBytes.length))
    } else {
      bb.putInt(1).putInt(nameBytes.length).put(nameBytes)
      bb.position(bb.position() + (pad8(nameBytes.length) - nameBytes.length))
    }
    bb.putInt(matType).putInt(dataLen)
    for (c <- 0 until cols; r <- 0 until rows) put(bb, r, c) // col-major
    bb.position(bb.position() + (pad8(dataLen) - dataLen))
    bb.array()
  }

  private def writeMat(path: String, elements: Array[Byte]*): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    val head = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    head.put("MATLAB 5.0 MAT-file, written by MatSpec"
      .getBytes(StandardCharsets.US_ASCII))
    head.position(124)
    head.putShort(0x0100.toShort)
    head.put('I'.toByte).put('M'.toByte)
    out.write(head.array())
    elements.foreach(out.write)
    out.close()
  }

  private def zlibWrap(element: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(element); d.finish()
    val buf = new Array[Byte](element.length + 64)
    val n = d.deflate(buf)
    d.end()
    val bb = ByteBuffer.allocate(8 + n).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(15).putInt(n).put(buf, 0, n) // miCOMPRESSED
    bb.array()
  }

  private lazy val dir = Files.createTempDirectory("mat_spec").toString

  it("reads a float64 matrix with exact values despite column-major data") {
    val rows = 7; val cols = 3
    val expect = Array.tabulate(rows, cols)((r, c) => r * 10.0 + c + 0.25)
    writeMat(s"$dir/f8.mat", matrixElement("X1", rows, cols, 9, 8, 6,
      (bb, r, c) => bb.putDouble(expect(r)(c))))
    val df = spark.read.format("mat").load(s"$dir/f8.mat")
    assert(df.schema.fieldNames.toSeq == Seq("row_idx", "values"))
    val got = df.orderBy("row_idx").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    assert(got.map(_._1).toSeq == (0L until rows))
    got.foreach { case (r, vs) => assert(vs.sameElements(expect(r.toInt))) }
  }

  it("selects a variable by name from a multi-variable file") {
    writeMat(s"$dir/multi.mat",
      matrixElement("A", 2, 2, 9, 8, 6, (bb, r, c) => bb.putDouble(r + c)),
      matrixElement("Blong", 3, 1, 5, 4, 12,
        (bb, r, c) => bb.putInt(100 + r)))
    val b = spark.read.format("mat").option("variable", "Blong")
      .load(s"$dir/multi.mat").orderBy("row_idx").collect()
      .map(_.getSeq[Double](1).head)
    assert(b.toSeq == Seq(100.0, 101.0, 102.0))
    // default = first readable variable
    val a = spark.read.format("mat").load(s"$dir/multi.mat")
    assert(a.count() == 2)
    val e = intercept[Exception] {
      spark.read.format("mat").option("variable", "nope")
        .load(s"$dir/multi.mat").collect()
    }
    assert(e.getMessage.contains("no variable 'nope'"))
  }

  it("decodes MATLAB's compact int storage (double class, int16 data)") {
    // MATLAB stores double-class values as the smallest lossless int
    // type; decode must follow the DATA element's type, not the class
    writeMat(s"$dir/compact.mat", matrixElement("C", 2, 2, 3, 2, 6,
      (bb, r, c) => bb.putShort((r * 10 + c).toShort)))
    val vs = spark.read.format("mat").load(s"$dir/compact.mat")
      .orderBy("row_idx").collect().map(_.getSeq[Double](1).toSeq)
    assert(vs.toSeq == Seq(Seq(0.0, 1.0), Seq(10.0, 11.0)))
  }

  it("reads a miCOMPRESSED variable (one zlib stream, one partition)") {
    val rows = 5; val cols = 4
    val expect = Array.tabulate(rows, cols)((r, c) => r * 2.0 - c)
    writeMat(s"$dir/z.mat", zlibWrap(
      matrixElement("Z", rows, cols, 9, 8, 6,
        (bb, r, c) => bb.putDouble(expect(r)(c)))))
    val df = spark.read.format("mat").load(s"$dir/z.mat")
    assert(df.rdd.getNumPartitions == 1) // zlib is not seekable
    val got = df.orderBy("row_idx").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    assert(got.length == rows)
    got.foreach { case (r, vs) => assert(vs.sameElements(expect(r.toInt))) }
  }

  it("splits an uncompressed matrix into row-range partitions that tile") {
    val rows = 100; val cols = 5
    writeMat(s"$dir/big.mat", matrixElement("B", rows, cols, 9, 8, 6,
      (bb, r, c) => bb.putDouble(r * 1000.0 + c)))
    val df = spark.read.format("mat").option("numPartitions", "7")
      .load(s"$dir/big.mat")
    assert(df.rdd.getNumPartitions == 7)
    val got = df.orderBy("row_idx").collect()
    assert(got.length == rows)
    assert(got.map(_.getLong(0)).toSeq == (0L until rows))
    got.foreach { r =>
      assert(r.getSeq[Double](1).head == r.getLong(0) * 1000.0)
    }
  }

  it("reads a directory of shards as one matrix with continuing row_idx") {
    val d2 = Files.createTempDirectory("mat_shards").toString
    writeMat(s"$d2/part0.mat", matrixElement("S", 2, 2, 9, 8, 6,
      (bb, r, c) => bb.putDouble(r * 2.0 + c)))
    writeMat(s"$d2/part1.mat", matrixElement("S", 3, 2, 9, 8, 6,
      (bb, r, c) => bb.putDouble(100 + r * 2.0 + c)))
    val got = spark.read.format("mat").load(d2)
      .orderBy("row_idx").collect()
    assert(got.map(_.getLong(0)).toSeq == (0L until 5))
    assert(got(2).getSeq[Double](1).head == 100.0)
  }

  it("prunes the values column and rejects unsupported arrays loudly") {
    val df = spark.read.format("mat").load(s"$dir/f8.mat")
    assert(df.select("row_idx").count() == 7)
    val plan = df.select("row_idx").queryExecution.executedPlan.toString
    assert(plan.contains("required=row_idx"), plan)
    // big-endian rejection
    val bePath = s"$dir/be.mat"
    val out = new DataOutputStream(new FileOutputStream(bePath))
    val head = ByteBuffer.allocate(128)
    head.put("MATLAB 5.0".getBytes(StandardCharsets.US_ASCII))
    head.position(124); head.putShort(0x0001.toShort) // BE version
    head.put('M'.toByte).put('I'.toByte)
    out.write(head.array()); out.close()
    val e = intercept[Exception] {
      spark.read.format("mat").load(bePath).collect()
    }
    assert(e.getMessage.contains("big-endian"))
  }
}
