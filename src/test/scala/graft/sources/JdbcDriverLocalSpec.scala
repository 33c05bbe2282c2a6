package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The driver-local embedded-Derby path (separate-JVM masters route all
  * embedded-URL I/O through the driver connection — see Jdbc.scaladoc).
  * The routing predicate itself only fires under local-cluster (the r9
  * separate-JVM bench exercises it end to end via j8); these specs pin
  * the path's BEHAVIOR from local mode by calling it directly:
  * roundtrip fidelity, Spark-writer-compatible identifier shape (so
  * upsertBatch's MERGE works against tables from either path), null
  * handling, and the loud unsupported-type error.
  */
class JdbcDriverLocalSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private val dbDirs = scala.collection.mutable.ArrayBuffer[java.io.File]()

  private def freshDb(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbclocal")
    dir.toFile.delete() // derby wants to create the directory itself
    dbDirs += dir.toFile
    Jdbc.derbyUrl(dir.toString)
  }

  override def afterAll(): Unit = {
    // each test's Derby database is a real directory tree; reap them
    // (per-DATABASE shutdown first so files are quiescent — not the
    // engine-wide form, which would also close other suites' embedded
    // databases in this shared test JVM) or every suite run leaves 4
    // graft_jdbclocal* trees in the system temp dir — the same leak
    // class EventStream's sink reaper exists for
    dbDirs.foreach { d =>
      try java.sql.DriverManager
        .getConnection(s"jdbc:derby:${d.getPath};shutdown=true")
      catch { case _: java.sql.SQLException => () } // success throws 08006
    }
    def rm(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    dbDirs.foreach(rm)
    super.afterAll()
  }

  it("writeViaDriver/readViaDriver roundtrip values, types, and nulls") {
    import spark.implicits._
    val url = freshDb()
    val df = Seq(
      (1L, Some("alpha"), 1.5, true),
      (2L, None: Option[String], -2.25, false),
      (3L, Some("gamma"), 0.0, true)
    ).toDF("id", "name", "score", "flag")
    Jdbc.writeViaDriver(df, url, "t_roundtrip", batchSize = 2)
    val back = Jdbc.readViaDriver(spark, url, "t_roundtrip")
    assert(back.schema.fieldNames.toSeq === Seq("id", "name", "score", "flag"))
    assert(back.schema("id").dataType.typeName === "long")
    assert(back.schema("score").dataType.typeName === "double")
    val rows = back.orderBy("id").collect().map(_.toSeq).toSeq
    assert(rows === Seq(
      Seq(1L, "alpha", 1.5, true),
      Seq(2L, null, -2.25, false),
      Seq(3L, "gamma", 0.0, true)))
  }

  it("enforces the driver-heap row ceiling loudly (ADVICE r9)") {
    import spark.implicits._
    val url = freshDb()
    Jdbc.writeViaDriver((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      url, "t_ceiling", 1000)
    spark.conf.set("graft.jdbc.driverLocalMaxRows", "5")
    try {
      val e = intercept[IllegalStateException] {
        Jdbc.readViaDriver(spark, url, "t_ceiling")
      }
      assert(e.getMessage.contains("driverLocalMaxRows"),
        s"ceiling error must name the escape hatch: ${e.getMessage}")
      assert(e.getMessage.contains("t_ceiling"),
        s"ceiling error must name the table: ${e.getMessage}")
      // at-or-under the ceiling still reads fine
      spark.conf.set("graft.jdbc.driverLocalMaxRows", "10")
      assert(Jdbc.readViaDriver(spark, url, "t_ceiling").count() === 10)
    } finally spark.conf.unset("graft.jdbc.driverLocalMaxRows")
  }

  it("overwrite drops and recreates; batch boundary is exact") {
    import spark.implicits._
    val url = freshDb()
    Jdbc.writeViaDriver(Seq((1L, "x")).toDF("id", "v"), url, "t_ow", 1000)
    // second write with batchSize == row count (boundary: final
    // executeBatch must not double-insert)
    val df2 = (1L to 4L).map(i => (i, s"v$i")).toDF("id", "v")
    Jdbc.writeViaDriver(df2, url, "t_ow", batchSize = 4)
    val back = Jdbc.readViaDriver(spark, url, "t_ow")
    assert(back.count() === 4)
    assert(back.agg(min("id"), max("id")).head().toSeq === Seq(1L, 4L))
  }

  it("creates the same identifier shape as Spark's JDBC writer (MERGE-compatible)") {
    import spark.implicits._
    val url = freshDb()
    // target created by the DRIVER-LOCAL path...
    Jdbc.writeViaDriver(Seq((1L, "a", 0.5)).toDF("k", "name", "v"),
      url, "t_merge", 1000)
    // ...then upsertBatch (Spark-writer stage + MERGE referencing the
    // unquoted table name and QUOTED lowercase columns) must fold a
    // batch into it — the exact cross-path shape a restart recovery
    // under a separate-JVM master produces
    Jdbc.upsertBatch(Seq((1L, "b", 2.5), (2L, "c", 9.0)).toDF("k", "name", "v"),
      url, "t_merge", keyCols = Seq("k"))
    val rows = Jdbc.readViaDriver(spark, url, "t_merge")
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(rows === Seq(Seq(1L, "b", 2.5), Seq(2L, "c", 9.0)))
  }

  it("rejects unmappable column types loudly") {
    import spark.implicits._
    val url = freshDb()
    val df = Seq((1L, Array(1.0, 2.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Jdbc.writeViaDriver(df, url, "t_bad", 1000)
    }
    assert(e.getMessage.contains("no Derby mapping"))
  }
}
