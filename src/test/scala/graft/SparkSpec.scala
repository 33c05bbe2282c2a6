package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * session startup is ~5s, so suites must not each build their own). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[threads, maxFailures]: allow one task retry, the cluster
      // default behavior (plain local[n] makes any task failure fatal),
      // so specs can exercise the re-execution path a real cluster
      // takes constantly (RetryDeterminismSpec injects such failures)
      .master("local[4, 2]")
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
