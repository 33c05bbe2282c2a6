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
      val h = s.sql("SELECT graft_polyhash64('spark') AS h")
        .head().getLong(0)
      assert(h == graft.functions.PolyHash64.hash("spark"))
      val sh = s.sql(
        "SELECT graft_simhash64(array(graft_polyhash64('a'))) AS f")
        .head().getLong(0)
      assert(sh == graft.functions.PolyHash64.hash("a"),
        "one-token SimHash must equal the token hash (every vote wins)")
      val sp = s.sql(
        "SELECT graft_span_hash(array(1L, 2L, 3L), 2) AS hs")
        .head().getSeq[Long](0)
      assert(sp == graft.functions.SpanHash.spans(Array(1L, 2L, 3L), 2).toSeq)
    } finally {
      prior.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }
}
