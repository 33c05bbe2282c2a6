package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ExtensionOps, MetricOps, RelationalOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every [SQL] operator of SURVEY.md §2 (relational
  * surface of the reference pipeline) plus the training-data-pipeline
  * extensions (dedup / similarity / text analysis). Each entry pairs a
  * Spark DataFrame program with DuckDB oracle SQL where SQL-expressible.
  */
object SparkEntry {

  private val allDefs: Seq[QueryDef] = {
    val defs = RelationalOps.defs ++ TextOps.defs ++ SimilarityOps.defs ++
      MetricOps.defs ++ ExtensionOps.defs
    val dupes = defs.groupBy(_.name).filter(_._2.length > 1).keys
    require(dupes.isEmpty,
      s"duplicate query names would silently collapse: ${dupes.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary: scan → filter → hash-agg → sort —
    * exercises pushdown, partial aggregation, and whole-stage codegen.
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** [[oracleSql]] plus the dataset-dependent oracles (QueryDef.oracleGen):
    * queries whose SQL embeds a fitted model's literals. Call AFTER the
    * queries have run so each generator reuses the in-JVM cached model the
    * results were computed with. A generator failure degrades that query
    * to rows-only (entry omitted), never fails the dump. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    oracleSql ++ allDefs.flatMap(q => q.oracleGen.flatMap { g =>
      try Some(q.name -> g(spark, sfDir).trim)
      catch { case t: Throwable =>
        System.err.println(s"[oracleGen] ${q.name} failed: $t"); None
      }
    })
}
