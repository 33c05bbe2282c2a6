package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * session startup is ~5s, so suites must not each build their own). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSpec {
  lazy val spark: SparkSession = TestSpark.spark
}
