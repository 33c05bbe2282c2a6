package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (north-star "multi-source JDBC reads/writes"),
  * exercised against embedded Derby (ships with Spark — zero-egress).
  *
  * Scale notes: reads use partitionColumn/bounds/numPartitions so the
  * scan parallelizes across executors (one JDBC cursor per partition);
  * writes batch with a configurable batchsize. Predicate pushdown into
  * the JDBC source is Catalyst-managed (`PushedFilters` reach the
  * remote WHERE clause).
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  def derbyUrl(dir: String): String = s"jdbc:derby:$dir;create=true"

  /** True when `url` boots the SINGLE-PROCESS embedded Derby engine
    * (directory subprotocol, vs the `jdbc:derby://host:port/` client
    * form): only ONE JVM may hold the database at a time (db.lck).
    * Found the hard way under `local-cluster[2,8,*]` — Spark's
    * executor-parallel JDBC tasks each boot the engine in their own
    * JVM and deadlock on the lock file ("Failed to start database"). */
  def isEmbeddedDerby(url: String): Boolean =
    url.startsWith("jdbc:derby:") && !url.startsWith("jdbc:derby://")

  /** True when this session's executors run in JVMs other than the
    * driver's (local-cluster or a real cluster). */
  private def separateJvms(spark: SparkSession): Boolean =
    !spark.sparkContext.isLocal

  /** Executors must never touch a single-process embedded database
    * from another JVM: route through the driver connection instead.
    * A REAL deployment points the URL at a database server (the
    * `//host:port` form), where the executor-parallel paths below are
    * the ones that run — the driver-local path exists only for the
    * zero-egress embedded stand-in, whose data is test-sized. */
  private def driverLocal(spark: SparkSession, url: String): Boolean =
    isEmbeddedDerby(url) && separateJvms(spark)

  def write(df: DataFrame, url: String, table: String,
      mode: String = "overwrite", driver: String = DerbyDriver,
      batchSize: Int = 1000, columnTypes: Option[String] = None): Unit =
    if (driverLocal(df.sparkSession, url)) {
      require(mode == "overwrite",
        s"driver-local embedded-Derby write supports only overwrite, got $mode")
      // loud, like the mode gate: the driver path creates the table from
      // derbyType's fixed mapping, so a caller-supplied
      // createTableColumnTypes would be silently dropped — and surface
      // later as e.g. a VARCHAR truncation error far from its cause
      require(columnTypes.isEmpty,
        "driver-local embedded-Derby write ignores createTableColumnTypes " +
          s"(got ${columnTypes.get}); it types columns via derbyType — " +
          "use a server-mode URL for custom column types")
      writeViaDriver(df, url, table, batchSize)
    } else {
      val w = df.write.format("jdbc")
        .option("url", url).option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", batchSize)
      columnTypes.foreach(w.option("createTableColumnTypes", _))
      w.mode(mode).save()
    }

  /** Parallel partitioned read over a numeric column's range. */
  def read(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long,
      numPartitions: Int = 4, driver: String = DerbyDriver): DataFrame =
    if (driverLocal(spark, url)) readViaDriver(spark, url, table)
    else spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Single-cursor read (small dims). */
  def readAll(spark: SparkSession, url: String, table: String,
      driver: String = DerbyDriver): DataFrame =
    if (driverLocal(spark, url)) readViaDriver(spark, url, table)
    else spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .load()

  /** Spark type → Derby DDL for the driver-local embedded path. String
    * columns pin to VARCHAR(1024) — the same choice [[upsertBatch]]
    * documents (Derby's CLOB default cannot be MERGE-compared). */
  private def derbyType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case StringType => "VARCHAR(1024)"
      case TimestampType => "TIMESTAMP"
      case BooleanType => "BOOLEAN"
      case other => throw new IllegalArgumentException(
        s"no Derby mapping for $other in the driver-local embedded path")
    }
  }

  /** Overwrite `table` through the DRIVER's connection: unquoted table
    * identifier + quoted lowercase columns — the exact shape Spark's
    * own JDBC writer creates, so [[upsertBatch]]'s MERGE text works
    * against tables from either path. Batched inserts over
    * toLocalIterator keep driver memory bounded at one partition. */
  private[sources] def writeViaDriver(df: DataFrame, url: String, table: String,
      batchSize: Int): Unit = {
    val schema = df.schema
    def q(c: String) = "\"" + c + "\""
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        try st.executeUpdate(s"DROP TABLE $table")
        catch { case _: java.sql.SQLException => () } // didn't exist
        st.executeUpdate(s"CREATE TABLE $table (" +
          schema.fields.map(f => s"${q(f.name)} ${derbyType(f.dataType)}")
            .mkString(", ") + ")")
      } finally st.close()
      val ins = conn.prepareStatement(
        s"INSERT INTO $table (${schema.fieldNames.map(q).mkString(", ")}) " +
          s"VALUES (${schema.fields.map(_ => "?").mkString(", ")})")
      try {
        var inBatch = 0
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (row.isNullAt(i)) ins.setObject(i + 1, null)
            else ins.setObject(i + 1, row.get(i))
          }
          ins.addBatch()
          inBatch += 1
          if (inBatch >= batchSize) { ins.executeBatch(); inBatch = 0 }
        }
        if (inBatch > 0) ins.executeBatch()
      } finally ins.close()
    } finally conn.close()
  }

  /** Full-table read through the DRIVER's connection, rebuilt as a
    * (test-sized) local DataFrame. */
  private[sources] def readViaDriver(spark: SparkSession, url: String,
      table: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT * FROM $table")
        val md = rs.getMetaData
        val n = md.getColumnCount
        val fields = (1 to n).map { i =>
          val dt = md.getColumnType(i) match {
            case java.sql.Types.BIGINT => LongType
            case java.sql.Types.INTEGER => IntegerType
            case java.sql.Types.DOUBLE | java.sql.Types.FLOAT => DoubleType
            case java.sql.Types.REAL => FloatType
            case java.sql.Types.VARCHAR | java.sql.Types.CLOB => StringType
            case java.sql.Types.TIMESTAMP => TimestampType
            case java.sql.Types.BOOLEAN => BooleanType
            case other => throw new IllegalArgumentException(
              s"no Spark mapping for java.sql.Types code $other " +
                "in the driver-local embedded path")
          }
          StructField(md.getColumnName(i), dt)
        }
        // defensive ceiling (ADVICE r9): this path buffers the whole
        // table on the DRIVER (that is its point — embedded Derby/H2
        // URLs deadlock under separate executor JVMs, JdbcDriverLocalSpec),
        // so an unexpectedly large embedded table must fail loudly and
        // attributably, not as a generic driver OOM. Server URLs never
        // come here — they keep executor-parallel partitioned reads.
        val maxRows = spark.conf
          .get("graft.jdbc.driverLocalMaxRows", "5000000").toLong
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"reading $table via the DRIVER-LOCAL embedded-URL path " +
            s"(buffered on the driver heap, ceiling $maxRows rows)")
        val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (rs.next()) {
          if (rows.length >= maxRows)
            throw new IllegalStateException(
              s"embedded-URL driver-local read of $table exceeded " +
                s"$maxRows rows — an embedded database this size would " +
                "exhaust the driver heap. Move the table to a server " +
                "URL (executor-parallel partitioned read) or raise " +
                "graft.jdbc.driverLocalMaxRows explicitly.")
          rows += Row.fromSeq((1 to n).map { i =>
            val v = fields(i - 1).dataType match {
              case LongType => rs.getLong(i)
              case IntegerType => rs.getInt(i)
              case DoubleType => rs.getDouble(i)
              case FloatType => rs.getFloat(i)
              case StringType => rs.getString(i)
              case TimestampType => rs.getTimestamp(i)
              case BooleanType => rs.getBoolean(i)
              case _ => rs.getObject(i)
            }
            if (rs.wasNull()) null else v
          })
        }
        rs.close()
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq),
          StructType(fields))
      } finally st.close()
    } finally conn.close()
  }

  /** Idempotent key-upsert of one micro-batch into a JDBC table — the
    * `foreachBatch` terminal of a streaming pipeline. The batch lands
    * in a staging table (parallel JDBC write), then ONE transactional
    * MERGE folds it into the target keyed by `keyCols`: a replayed
    * micro-batch (restart recovery re-delivers the last batch;
    * foreachBatch is at-least-once) overwrites identical rows instead
    * of duplicating them, so the TABLE state is exactly-once. Target is
    * created empty on first use. Scale shape: the stage write is
    * executor-parallel and batched; only the MERGE statement runs on
    * the driver connection (set-based, executes inside the warehouse).
    *
    * Constraints (validated up front, not silently truncated):
    *  - string columns are pinned to `VARCHAR(1024)` at table creation
    *    (Derby's default StringType mapping is CLOB, which MERGE cannot
    *    compare on) — a row whose string value exceeds 1024 chars fails
    *    the stage insert; widen here if a wider payload ever needs it;
    *  - table/column names are interpolated into the MERGE text, so
    *    they must match `[A-Za-z_][A-Za-z0-9_]*` — enforced by require
    *    below rather than attempting SQL-injection-proof quoting. */
  def upsertBatch(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], driver: String = DerbyDriver): Unit = {
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains),
      s"keyCols $keyCols must be columns of ${df.columns.mkString(",")}")
    val ident = "[A-Za-z_][A-Za-z0-9_]*".r
    (table +: df.columns.toSeq).foreach { n =>
      require(ident.matches(n),
        s"identifier '$n' is interpolated into MERGE SQL and must match " +
          "[A-Za-z_][A-Za-z0-9_]*")
    }
    val stage = s"${table}_stage"
    // Derby's default mapping for StringType is CLOB, which MERGE
    // cannot compare on — pin string columns to VARCHAR at creation
    val varchars = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(1024)")
    val colTypes = if (varchars.isEmpty) None else Some(varchars.mkString(", "))
    write(df, url, stage, mode = "overwrite", driver = driver,
      columnTypes = colTypes)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(
        null, null, table.toUpperCase(java.util.Locale.ROOT), null)
      val exists = meta.next()
      meta.close()
      if (!exists) write(df.limit(0), url, table, mode = "overwrite",
        driver = driver, columnTypes = colTypes)
      // Spark's JDBC writer creates QUOTED (case-sensitive, lowercase)
      // column identifiers; unquoted references would fold to uppercase
      // in the warehouse and miss them
      def q(c: String) = "\"" + c + "\""
      val cols = df.columns.toSeq
      val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val set = cols.filterNot(keyCols.contains)
        .map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")
      val merge =
        s"""MERGE INTO $table t USING $stage s ON $on
           |WHEN MATCHED THEN UPDATE SET $set
           |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
           |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
      val st = conn.createStatement()
      try st.executeUpdate(merge) finally st.close()
    } finally conn.close()
  }

  // Pay-once per (JVM, db, table): bounds of the partition column, cached
  // after the one-time Derby load so the steady-state query is write-free
  // (mirrors ScaleUtils.bucketedPair's pay-the-layout-once semantics).
  private val loaded = scala.collection.mutable.Map.empty[String, (Long, Long)]

  /** Ensure `df` is materialized as `table` in the Derby db at `dbDir`
    * (written once per JVM per db/table), and return (url, lower, upper)
    * bounds of `partitionCol` for a parallel partitioned read back. */
  def ensureTable(df: DataFrame, dbDir: String, table: String,
      partitionCol: String): (String, Long, Long) = {
    val url = derbyUrl(dbDir)
    val key = s"$dbDir#$table"
    val (lo, hi) = this.synchronized {
      loaded.getOrElseUpdate(key, {
        write(df, url, table)
        // scalar min/max: a sanctioned driver finish (2 longs)
        val r = df.agg(org.apache.spark.sql.functions.min(partitionCol),
          org.apache.spark.sql.functions.max(partitionCol)).head()
        (r.getLong(0), r.getLong(1))
      })
    }
    (url, lo, hi)
  }
}
