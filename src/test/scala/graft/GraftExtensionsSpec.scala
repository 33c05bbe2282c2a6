package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec

class GraftExtensionsSpec extends AnyFunSpec {
  it("injects graft_cosine via SparkSessionExtensions") {
    // force a NEW session. NB: the `spark.sql.extensions` STATIC conf is
    // read from the SparkContext, so with a pre-existing context (shared
    // test JVM) the programmatic withExtensions path is the one that
    // applies — same GraftExtensions entry point either way.
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val v = s.sql(
        "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .head().getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
    } finally {
      prior.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }
}
