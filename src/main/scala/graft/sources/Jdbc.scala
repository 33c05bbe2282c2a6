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

  def write(df: DataFrame, url: String, table: String,
      mode: String = "overwrite", driver: String = DerbyDriver,
      batchSize: Int = 1000, columnTypes: Option[String] = None): Unit = {
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
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Single-cursor read (small dims). */
  def readAll(spark: SparkSession, url: String, table: String,
      driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .load()

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
