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
      batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .option("batchsize", batchSize)
      .mode(mode).save()

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
