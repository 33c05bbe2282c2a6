package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
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

/** MATLAB MAT-File Level 5 numeric-matrix scan as a DataSource V2 (the
  * reference's dormant `scio.loadmat` alternate input,
  * `Simulation_Auxiliary/mocss.py:376-383`, re-expressed as a real
  * splittable Spark source — the last "no" in the extended S6 source
  * inventory). Format per the public MAT-File Format spec (Level 5).
  *
  *   spark.read.format("mat").option("variable", "X1").load("/d/a.mat")
  *     → (row_idx BIGINT, values ARRAY<DOUBLE>)
  *
  * Scope (minimal by design): one real 2-D numeric matrix per read —
  * `variable` selects it by name, default = the first eligible variable;
  * little-endian files (what every x86 writer emits; big-endian is
  * rejected loudly); all numeric storage types incl. MATLAB's compact
  * int encodings; `miCOMPRESSED` variables via the JDK Inflater.
  * Complex, logical, cell/struct/char and >2-D arrays are rejected with
  * the reason.
  *
  * Scale design, where MAT differs from [[NpyDataSource]]:
  *  - MAT data is COLUMN-major, so a logical row is strided across the
  *    file. Uncompressed variables still split by row ranges (default
  *    ~64 MB decoded per partition): each task issues one positioned
  *    read per column over its row window — sequential-friendly strides,
  *    no shuffle, no whole-matrix buffering.
  *  - The format's uint32 element length caps one variable at 4 GiB, so
  *    per-variable work is inherently bounded; a directory of shards
  *    reads as one matrix with `row_idx` continuing in name order (the
  *    npy multi-file convention), which is how a big corpus actually
  *    arrives.
  *  - `miCOMPRESSED` is one zlib stream per variable — not seekable, so
  *    a compressed variable reads as ONE partition that inflates
  *    straight into its column-major buffer (≤ the 4 GiB format cap;
  *    write with `do_compression=False` for the parallel path).
  *  - Column pruning: a `count()`/`row_idx`-only plan reads no data
  *    bytes (uncompressed) or inflates without decoding (compressed).
  */
class MatDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "mat"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MatDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MatTable(properties.get("path"), properties)
}

object MatDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("row_idx", LongType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  // MAT data-element types → byte widths (real numeric storage types)
  private[sources] val TypeBytes = Map(
    1 -> 1, 2 -> 1, 3 -> 2, 4 -> 2, 5 -> 4, 6 -> 4, // i8 u8 i16 u16 i32 u32
    7 -> 4, 9 -> 8, 12 -> 8, 13 -> 8) // single, double, i64, u64
  private val MiMatrix = 14
  private val MiCompressed = 15
  private val NumericClasses = 6 to 15 // mxDOUBLE..mxUINT64

  /** One readable variable: where its real data lives and its shape.
    * `dataOffset` is into the raw file (uncompressed) or into the
    * INFLATED element stream (compressed, relative to the start of the
    * compressed element's payload at `elementOffset`). */
  private[sources] case class Meta(path: String, name: String, rows: Long,
      cols: Int, matType: Int, dataOffset: Long, compressed: Boolean,
      elementOffset: Long, elementSize: Long) {
    def itemSize: Int = TypeBytes(matType)
  }

  private def pad8(n: Long): Long = (n + 7) & ~7L

  /** Parse the sub-elements of one miMATRIX payload (starting at
    * relative offset 0 of `buf`); returns None for non-matrix or
    * unsupported array kinds, Some(name, rows, cols, type, dataOff). */
  private def parseMatrix(buf: ByteBuffer): Option[(String, Long, Int, Int, Long)] = {
    def tagAt(off: Int): (Int, Int, Int) = { // (type, size, dataOff)
      val raw = buf.getInt(off)
      if ((raw >>> 16) != 0) (raw & 0xFFFF, raw >>> 16, off + 4) // small
      else (raw, buf.getInt(off + 4), off + 8)
    }
    // Array Flags: 8 data bytes; byte0 = class, byte1 = flags
    val (ft, _, fOff) = tagAt(0)
    require(ft == 6, s"mat: expected miUINT32 array flags, got $ft")
    val flagsWord = buf.getInt(fOff)
    val clazz = flagsWord & 0xFF
    val flags = (flagsWord >>> 8) & 0xFF
    if (!NumericClasses.contains(clazz)) return None // cell/struct/char…
    require((flags & 0x08) == 0, "mat: complex matrices not supported")
    require((flags & 0x02) == 0, "mat: logical matrices not supported")
    // Dimensions
    val dimTagOff = fOff + 8
    val (dt, dSize, dOff) = tagAt(dimTagOff)
    require(dt == 5, s"mat: expected miINT32 dimensions, got $dt")
    val nDims = dSize / 4
    require(nDims == 2,
      s"mat: only 2-D matrices supported, got $nDims dims")
    val rows = buf.getInt(dOff).toLong
    val cols = buf.getInt(dOff + 4)
    // Name
    val nameTagOff = dOff + pad8(dSize).toInt
    val (nt, nSize, nOff) = tagAt(nameTagOff)
    require(nt == 1, s"mat: expected miINT8 name, got $nt")
    val nameBytes = new Array[Byte](nSize)
    var i = 0
    while (i < nSize) { nameBytes(i) = buf.get(nOff + i); i += 1 }
    val name = new String(nameBytes, java.nio.charset.StandardCharsets.US_ASCII)
    // Real part
    val dataTagOff =
      if ((buf.getInt(nameTagOff) >>> 16) != 0) nameTagOff + 8 // small name
      else nOff + pad8(nSize).toInt
    val (vt, vSize, vOff) = tagAt(dataTagOff)
    require(TypeBytes.contains(vt), s"mat: unsupported data type $vt")
    require(vSize.toLong == rows * cols * TypeBytes(vt),
      s"mat: $name data size $vSize != $rows x $cols x ${TypeBytes(vt)}")
    Some((name, rows, cols, vt, vOff.toLong))
  }

  /** Inflate up to `limit` bytes from a compressed element. */
  private[sources] def inflate(raw: Array[Byte], limit: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new Array[Byte](limit)
    var n = 0
    while (n < limit && !inf.finished()) {
      val got = inf.inflate(out, n, limit - n)
      if (got == 0 && inf.needsInput()) sys.error("mat: truncated zlib data")
      n += got
    }
    inf.end()
    require(n > 0, "mat: empty compressed element")
    java.util.Arrays.copyOf(out, n)
  }

  /** Scan one file's top-level elements for readable 2-D matrices. */
  private[sources] def readMetas(fs: FileSystem, p: Path): Seq[Meta] = {
    val in = fs.open(p)
    try {
      val fileLen = fs.getFileStatus(p).getLen
      val head = new Array[Byte](128)
      in.readFully(0L, head)
      val version = ByteBuffer.wrap(head, 124, 2)
        .order(ByteOrder.LITTLE_ENDIAN).getShort(124)
      val endian = new String(head, 126, 2,
        java.nio.charset.StandardCharsets.US_ASCII)
      require(endian == "IM",
        if (endian == "MI") s"$p: big-endian MAT files not supported"
        else s"$p: not a MAT-v5 file (endian indicator '$endian')")
      require(version == 0x0100, s"$p: unsupported MAT version $version")
      val metas = Seq.newBuilder[Meta]
      var off = 128L
      while (off + 8 <= fileLen) {
        val tag = new Array[Byte](8)
        in.readFully(off, tag)
        val bb = ByteBuffer.wrap(tag).order(ByteOrder.LITTLE_ENDIAN)
        val rawType = bb.getInt(0)
        require((rawType >>> 16) == 0,
          s"$p: small element at top level (offset $off)")
        val size = bb.getInt(4).toLong & 0xFFFFFFFFL
        val dataStart = off + 8
        rawType match {
          case MiMatrix =>
            // header sub-elements fit well within 512 bytes
            val hdr = new Array[Byte](math.min(size, 512L).toInt)
            in.readFully(dataStart, hdr)
            parseMatrix(ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN))
              .foreach { case (name, rows, cols, vt, vOff) =>
                metas += Meta(p.toString, name, rows, cols, vt,
                  dataStart + vOff, compressed = false, dataStart, size)
              }
          case MiCompressed =>
            // inflate just enough for the embedded matrix header
            val probe = new Array[Byte](math.min(size, 1024L).toInt)
            in.readFully(dataStart, probe)
            val hdr = inflate(probe, 520)
            val hb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
            val innerType = hb.getInt(0)
            if (innerType == MiMatrix)
              // NB: slice() BEFORE order() — ByteBuffer.slice resets
              // the byte order to big-endian
              parseMatrix(ByteBuffer.wrap(hdr, 8, hdr.length - 8)
                  .slice().order(ByteOrder.LITTLE_ENDIAN))
                .foreach { case (name, rows, cols, vt, vOff) =>
                  metas += Meta(p.toString, name, rows, cols, vt,
                    8 + vOff, compressed = true, dataStart, size)
                }
          case _ => // skip non-matrix top-level elements
        }
        off = dataStart + pad8(size)
      }
      metas.result()
    } finally in.close()
  }

  private[sources] def resolveFiles(fs: FileSystem, raw: String): Seq[Path] = {
    val matched = Option(fs.globStatus(new Path(raw)))
      .getOrElse(Array.empty).toSeq
    require(matched.nonEmpty, s"mat: no files match $raw")
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".mat"))
      else Seq(st)
    }
    require(files.nonEmpty, s"mat: no .mat files under $raw")
    files.map(_.getPath).sortBy(_.getName)
  }
}

private[sources] class MatTable(path: String, properties: JMap[String, String])
    extends Table with SupportsRead {
  require(path != null, "mat: .load(path) is required")

  override def name(): String = s"mat($path)"
  override def schema(): StructType = MatDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MatScanBuilder(path, options)
}

private[sources] class MatScanBuilder(path: String,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = MatDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new MatScan(path, required,
    Option(options.get("variable")),
    Option(options.get("numPartitions")).map(_.toInt),
    Option(options.get("partitionBytes")).map(_.toLong)
      .getOrElse(64L * 1024 * 1024))
}

private[sources] case class MatInputPartition(meta: MatDataSource.Meta,
    rowStart: Long, rowEnd: Long, rowIdxOffset: Long) extends InputPartition

private[sources] class MatScan(path: String, required: StructType,
    variable: Option[String], numPartitions: Option[Int],
    partitionBytes: Long) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mat $path var=${variable.getOrElse("<first>")} " +
      s"required=${required.fieldNames.mkString(",")}"

  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] = {
    val qualified = if (path.contains(":/")) path else s"file:$path"
    val fs = new Path(qualified).getFileSystem(hadoopConf)
    val metas = MatDataSource.resolveFiles(fs, path).map { p =>
      val all = MatDataSource.readMetas(fs, p)
      require(all.nonEmpty, s"$p: no readable 2-D numeric matrix")
      variable match {
        case Some(v) => all.find(_.name == v).getOrElse(sys.error(
          s"$p: no variable '$v' (has: ${all.map(_.name).mkString(", ")})"))
        case None => all.head
      }
    }
    require(metas.map(_.cols).distinct.size == 1,
      s"mat: shards disagree on column count: " +
        metas.map(m => s"${m.path}=${m.cols}").mkString(", "))
    val offsets = metas.scanLeft(0L)(_ + _.rows)
    metas.zip(offsets).flatMap { case (m, off) =>
      if (m.compressed)
        Seq(MatInputPartition(m, 0L, m.rows, off)) // one zlib stream
      else {
        val rowBytes = m.cols.toLong * m.itemSize
        val nSplits = numPartitions.map(_.toLong)
          .getOrElse(math.max(1L,
            m.rows * rowBytes / math.max(partitionBytes, 1L)))
          .min(math.max(m.rows, 1L)).max(1L)
        val per = (m.rows + nSplits - 1) / nSplits
        (0L until nSplits).map { s =>
          MatInputPartition(m, s * per, math.min((s + 1) * per, m.rows), off)
        }.filter(p => p.rowStart < p.rowEnd)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MatReaderFactory(required,
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
}

private[sources] class MatReaderFactory(required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MatPartitionReader(partition.asInstanceOf[MatInputPartition],
      required, conf)
}

/** Decodes one row-range of a column-major variable: one positioned
  * read per column over the row window (uncompressed) or one streaming
  * inflate (compressed); rows are then emitted by stride — no transpose
  * copy. With `values` pruned, uncompressed partitions read no data
  * bytes at all. */
private[sources] class MatPartitionReader(p: MatInputPartition,
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val needValues = required.fieldNames.contains("values")
  private val winRows = (p.rowEnd - p.rowStart).toInt
  private var row = 0
  private var current: InternalRow = _

  // column-major window buffer: buf(c * winRows + r)
  private lazy val window: Array[Double] = {
    val m = p.meta
    val qualified =
      if (m.path.contains(":/")) m.path else s"file:${m.path}"
    val hp = new org.apache.hadoop.fs.Path(qualified)
    val fs = hp.getFileSystem(conf.value)
    val out = new Array[Double](winRows * m.cols)
    val in = fs.open(hp)
    try {
      if (m.compressed) {
        // JVM arrays cap a single inflate at 2 GiB; the format itself
        // allows 4 GiB. Reject loudly instead of overflowing toInt.
        val need0 = m.dataOffset + m.rows * m.cols * m.itemSize
        require(m.elementSize <= Int.MaxValue && need0 <= Int.MaxValue,
          s"mat: compressed variable ${m.name} too large to inflate " +
            s"in one buffer (${need0} B decoded); rewrite with " +
            "do_compression=False for the splittable path")
        val raw = new Array[Byte](m.elementSize.toInt)
        in.readFully(m.elementOffset, raw)
        val all = MatDataSource.inflate(raw, need0.toInt)
        val bb = ByteBuffer.wrap(all).order(ByteOrder.LITTLE_ENDIAN)
        var c = 0
        while (c < m.cols) {
          var r = 0
          val base = (c * m.rows + p.rowStart) * m.itemSize
          while (r < winRows) {
            out(c * winRows + r) =
              decodeAt(bb, m.dataOffset.toInt + base.toInt + r * m.itemSize,
                m.matType)
            r += 1
          }
          c += 1
        }
      } else {
        val colBuf = new Array[Byte](winRows * m.itemSize)
        var c = 0
        while (c < m.cols) {
          in.readFully(
            m.dataOffset + (c * m.rows + p.rowStart) * m.itemSize,
            colBuf)
          val bb = ByteBuffer.wrap(colBuf).order(ByteOrder.LITTLE_ENDIAN)
          var r = 0
          while (r < winRows) {
            out(c * winRows + r) = decodeAt(bb, r * m.itemSize, m.matType)
            r += 1
          }
          c += 1
        }
      }
    } finally in.close()
    out
  }

  private def decodeAt(bb: ByteBuffer, off: Int, t: Int): Double = t match {
    case 9 => bb.getDouble(off)
    case 7 => bb.getFloat(off).toDouble
    case 5 => bb.getInt(off).toDouble
    case 6 => (bb.getInt(off).toLong & 0xFFFFFFFFL).toDouble
    case 3 => bb.getShort(off).toDouble
    case 4 => (bb.getShort(off) & 0xFFFF).toDouble
    case 1 => bb.get(off).toDouble
    case 2 => (bb.get(off) & 0xFF).toDouble
    case 12 => bb.getLong(off).toDouble
    case 13 => bb.getLong(off).toDouble // u64 best-effort
  }

  override def next(): Boolean = {
    if (row >= winRows) return false
    val fields = new Array[Any](required.length)
    var decoded: GenericArrayData = null
    if (needValues) {
      val m = p.meta
      val out = new Array[Double](m.cols)
      var c = 0
      while (c < m.cols) { out(c) = window(c * winRows + row); c += 1 }
      decoded = new GenericArrayData(out)
    }
    var f = 0
    while (f < required.length) {
      fields(f) = required.fields(f).name match {
        case "row_idx" => p.rowIdxOffset + p.rowStart + row
        case "values" => decoded
      }
      f += 1
    }
    current = new GenericInternalRow(fields)
    row += 1
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = ()
}
