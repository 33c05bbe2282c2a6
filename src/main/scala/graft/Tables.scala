package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-provided testdata star schema
  * (see TESTDATA.md). All `SparkEntry.queries` read through here so the
  * parquet scans stay uniform (columnar, pushdown-friendly).
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = t(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame   = t(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = t(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = t(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = t(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame   = t(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame   = t(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame   = t(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame  = t(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = t(spark, d, "embeddings")
}

/** One named query in the driver contract: a Spark DataFrame program plus
  * (when SQL-expressible) the equivalent DuckDB oracle SQL. Column names
  * and row values must match the oracle exactly — every computed column is
  * aliased identically on both sides, doubles are rounded to a fixed scale,
  * and results carry a deterministic ORDER BY so hashing is stable.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Dataset-dependent oracle: some queries' semantics are fixed only
      * once a fitted model (IVF centroids, PQ codebooks) exists. The
      * models are fit-once-per-dataset plan-time constants, so the
      * generator inlines them as SQL literals — same recipe as y4's
      * literal hyperplanes, just generated after the fit instead of at
      * class load. Verify evaluates these with its (spark, sfDir) AFTER
      * running the queries, so the literals come from the very model
      * objects the query results used. */
    oracleGen: Option[(SparkSession, String) => String] = None)
