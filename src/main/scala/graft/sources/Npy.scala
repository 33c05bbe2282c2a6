package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NumPy `.npy` matrix scan as a DataSource V2 (S6 — the reference's
  * dormant `np.load`/`scio.loadmat` alternate inputs,
  * `Simulation_Auxiliary/mocss.py:376-399`, re-expressed as a real
  * splittable Spark source instead of a driver-side load).
  *
  *   spark.read.format("npy").load("/data/expr.npy")
  *     → (row_idx BIGINT, values ARRAY<DOUBLE>)
  *
  * Scale design:
  *  - **Splittable**: a 2-D C-order `.npy` is a fixed-stride record
  *    file, so the Batch plans row-range InputPartitions (default
  *    ~64 MB each, `numPartitions`/`partitionBytes` options override) —
  *    a 100 GB matrix becomes ~1600 parallel tasks, each seeking
  *    directly to `dataOffset + rowStart·cols·itemSize`.
  *  - **Column pruning**: implements SupportsPushDownRequiredColumns;
  *    a `count()`/`row_idx`-only plan never reads or decodes the data
  *    bytes at all.
  *  - **Multi-file**: a directory (or glob) of `.npy` shards with equal
  *    column counts reads as one matrix, `row_idx` continuing across
  *    files in name order (the layout a distributed writer produces).
  *
  * Format coverage: v1/v2 headers; dtypes `<f8 <f4 <i8 <i4 <i2 |i1 |u1`
  * (all surfaced as DOUBLE — the reference feeds float64 expression
  * matrices); 1-D arrays read as n×1. `fortran_order: True` is rejected
  * (column-major rows are not contiguous; transpose at write time).
  */
class NpyDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "npy"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NpyDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new NpyTable(properties.get("path"), properties)
}

object NpyDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("row_idx", LongType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  private[sources] val SupportedDtypes =
    Map("<f8" -> 8, "<f4" -> 4, "<i8" -> 8, "<i4" -> 4, "<i2" -> 2,
      "|i1" -> 1, "|u1" -> 1)

  /** Parsed `.npy` layout: where the records start and their shape. */
  private[sources] case class Meta(path: String, dataOffset: Long,
      rows: Long, cols: Int, dtype: String) {
    def itemSize: Int = SupportedDtypes(dtype)
    def rowBytes: Long = cols.toLong * itemSize
  }

  /** Read and validate one file's header (magic, version, dict). */
  private[sources] def readMeta(fs: FileSystem, p: Path): Meta = {
    val in = fs.open(p)
    try {
      val magic = new Array[Byte](8)
      in.readFully(0L, magic)
      require(magic.take(6).sameElements(
          Array(0x93.toByte) ++ "NUMPY".getBytes(StandardCharsets.US_ASCII)),
        s"$p: not a .npy file (bad magic)")
      val major = magic(6) & 0xFF
      val headerLenBytes = if (major == 1) 2 else 4
      val lenBuf = new Array[Byte](headerLenBytes)
      in.readFully(8L, lenBuf)
      val bb = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN)
      val headerLen =
        if (major == 1) bb.getShort.toInt & 0xFFFF else bb.getInt
      val header = new Array[Byte](headerLen)
      in.readFully(8L + headerLenBytes, header)
      val dict = new String(header, StandardCharsets.US_ASCII)

      val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(dict)
        .map(_.group(1))
        .getOrElse(sys.error(s"$p: no descr in npy header"))
      require(SupportedDtypes.contains(descr),
        s"$p: unsupported npy dtype '$descr' " +
          s"(supported: ${SupportedDtypes.keys.mkString(", ")})")
      val fortran = "'fortran_order'\\s*:\\s*(True|False)".r
        .findFirstMatchIn(dict).map(_.group(1)).getOrElse("False")
      require(fortran == "False",
        s"$p: fortran_order=True not supported (transpose at write time)")
      val shape = "'shape'\\s*:\\s*\\((\\s*\\d+\\s*(?:,\\s*\\d+\\s*)*),?\\s*\\)".r
        .findFirstMatchIn(dict).map(_.group(1))
        .getOrElse(sys.error(s"$p: no shape in npy header"))
      val dims = shape.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
      val (rows, cols) = dims match {
        case Array(n) => (n, 1L)
        case Array(r, c) => (r, c)
        case _ => sys.error(s"$p: only 1-D/2-D .npy supported, " +
          s"got shape (${dims.mkString(",")})")
      }
      require(cols <= Int.MaxValue, s"$p: too many columns ($cols)")
      // one row must fit a byte[] — without this, cols*itemSize > 2 GiB
      // would overflow rowBytes.toInt into a negative array size
      require(cols * SupportedDtypes(descr) <= Int.MaxValue,
        s"$p: row exceeds 2 GiB ($cols cols × ${SupportedDtypes(descr)} B)")
      Meta(p.toString, 8L + headerLenBytes + headerLen, rows, cols.toInt, descr)
    } finally in.close()
  }

  /** Expand a path/glob/directory into `.npy` files, name-sorted. */
  private[sources] def resolveFiles(fs: FileSystem, raw: String): Seq[Path] = {
    val matched = Option(fs.globStatus(new Path(raw)))
      .getOrElse(Array.empty).toSeq
    require(matched.nonEmpty, s"npy: no files match $raw")
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".npy"))
      else Seq(st)
    }
    require(files.nonEmpty, s"npy: no .npy files under $raw")
    files.map(_.getPath).sortBy(_.getName)
  }
}

private[sources] class NpyTable(path: String, properties: JMap[String, String])
    extends Table with SupportsRead {
  require(path != null, "npy: .load(path) is required")

  override def name(): String = s"npy($path)"
  override def schema(): StructType = NpyDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NpyScanBuilder(path, options)
}

private[sources] class NpyScanBuilder(path: String,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = NpyDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new NpyScan(path, required,
    Option(options.get("numPartitions")).map(_.toInt),
    Option(options.get("partitionBytes")).map(_.toLong)
      .getOrElse(64L * 1024 * 1024))
}

private[sources] case class NpyInputPartition(meta: NpyDataSource.Meta,
    rowStart: Long, rowEnd: Long, rowIdxOffset: Long) extends InputPartition

private[sources] class NpyScan(path: String, required: StructType,
    numPartitions: Option[Int], partitionBytes: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"npy $path required=${required.fieldNames.mkString(",")}"

  // Spark's Hadoop conf, not a blank Configuration — it carries
  // credentials/settings for non-local filesystems (ADVICE r4)
  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] = {
    val qualified = if (path.contains(":/")) path else s"file:$path"
    val fs = new Path(qualified).getFileSystem(hadoopConf)
    val metas = NpyDataSource.resolveFiles(fs, path)
      .map(p => NpyDataSource.readMeta(fs, p))
    require(metas.map(_.cols).distinct.size == 1,
      s"npy: shards disagree on column count: " +
        metas.map(m => s"${m.path}=${m.cols}").mkString(", "))
    // row_idx continues across files in name order
    val offsets = metas.scanLeft(0L)(_ + _.rows)
    metas.zip(offsets).flatMap { case (m, off) =>
      val bytes = m.rows * m.rowBytes
      val nSplits = numPartitions.map(_.toLong)
        .getOrElse(math.max(1L, bytes / math.max(partitionBytes, 1L)))
        .min(math.max(m.rows, 1L)).max(1L)
      val per = (m.rows + nSplits - 1) / nSplits
      (0L until nSplits).map { s =>
        NpyInputPartition(m, s * per, math.min((s + 1) * per, m.rows), off)
      }.filter(p => p.rowStart < p.rowEnd)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NpyReaderFactory(required,
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
}

private[sources] class NpyReaderFactory(required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NpyPartitionReader(partition.asInstanceOf[NpyInputPartition], required,
      conf)
}

/** Streams one row-range: a single seek, then buffered fixed-stride
  * record decode. When `values` is pruned away no data byte is read. */
private[sources] class NpyPartitionReader(p: NpyInputPartition,
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val needValues = required.fieldNames.contains("values")
  private var row = p.rowStart
  private var current: InternalRow = _
  private var stream: org.apache.hadoop.fs.FSDataInputStream = _

  private def in = {
    if (stream == null) {
      val qualified =
        if (p.meta.path.contains(":/")) p.meta.path else s"file:${p.meta.path}"
      val hp = new org.apache.hadoop.fs.Path(qualified)
      stream = hp.getFileSystem(conf.value).open(hp)
      stream.seek(p.meta.dataOffset + p.rowStart * p.meta.rowBytes)
    }
    stream
  }
  private lazy val rowBuf = new Array[Byte](p.meta.rowBytes.toInt)

  override def next(): Boolean = {
    if (row >= p.rowEnd) return false
    val fields = new Array[Any](required.length)
    var decoded: GenericArrayData = null
    if (needValues) {
      in.readFully(rowBuf, 0, rowBuf.length)
      val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Double](p.meta.cols)
      var i = 0
      while (i < p.meta.cols) {
        out(i) = p.meta.dtype match {
          case "<f8" => bb.getDouble
          case "<f4" => bb.getFloat.toDouble
          case "<i8" => bb.getLong.toDouble
          case "<i4" => bb.getInt.toDouble
          case "<i2" => bb.getShort.toDouble
          case "|i1" => bb.get.toDouble
          case "|u1" => (bb.get & 0xFF).toDouble
        }
        i += 1
      }
      decoded = new GenericArrayData(out)
    }
    var f = 0
    while (f < required.length) {
      fields(f) = required.fields(f).name match {
        case "row_idx" => p.rowIdxOffset + row
        case "values" => decoded
      }
      f += 1
    }
    current = new GenericInternalRow(fields)
    row += 1
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit =
    if (stream != null) {
      try stream.close() catch { case _: Throwable => }
      stream = null
    }
}
