package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two shuffle weapons SCALE.md leans on, as working utilities:
  *
  *  - Salting: a hot grouping key is split into `salt` sub-keys so its
  *    rows spread over `salt` reducers; a second (tiny) aggregation
  *    merges the partials. For algebraic aggregates this is exact.
  *  - Bucketing: co-partitioned, co-sorted table layout so equi-joins
  *    on the bucket key need NO shuffle at read time (plan shows no
  *    Exchange above the scans).
  */
object ScaleUtils {

  /** Collision-safe dataset namespace tag: SHA-1 hex prefix of the path.
    * `String.hashCode`'s 32 bits could collide two dataset paths and
    * silently reuse the other's physical layout / centroids (ADVICE r4);
    * 64 digest bits make that a non-event. */
  def pathTag(path: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString

  /** Content-keyed tag: the path PLUS (name, length, mtime) of every
    * file under it. A cross-JVM persisted model keyed on `pathTag`
    * alone goes stale when the data at a reused path is rewritten —
    * the blow-up probes regenerate /tmp corpus dirs in place, and a
    * warehouse model fit on the previous corpus would be silently
    * loaded (found by review in round 9: the pre-fix x10/x100 IVF
    * models survived the blowUpEmbeddings perturbation change). Stable
    * dirs (the driver's /root/testdata) keep a stable tag, so
    * fit-once persistence still pays off where it should. */
  def dataTag(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
          .flatMap(walk)
      else Seq(f)
    val sig = new StringBuilder(path)
    walk(new java.io.File(path)).foreach { f =>
      sig.append('|').append(f.getName).append(':')
        .append(f.length()).append(':').append(f.lastModified())
    }
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(sig.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Scale-adaptive partition count for a frame of `rows` rows at
    * ~`bytesPerRow` bytes each: enough partitions to keep each one near
    * `targetBytes` (the guide's 100 MB–1 GB shuffle-partition band,
    * r15 optimization round). Derived from the DATA, not from the local
    * core count — a tiny frame collapses to 1 partition (per-task
    * scheduling overhead dominates below ~megabytes) and a 100 TB frame
    * grows into the thousands, so the same call site is right at both
    * ends. Used where a materialized frame's physical partitioning is
    * pinned for many downstream jobs (iterative-loop checkpoints), where
    * AQE cannot help because the scan side of a checkpoint is not a
    * shuffle read. */
  def rowPartitions(rows: Long, bytesPerRow: Long,
      targetBytes: Long = 128L << 20): Int = {
    require(bytesPerRow > 0 && targetBytes > 0,
      s"bytesPerRow=$bytesPerRow targetBytes=$targetBytes")
    val p = math.ceil(rows.toDouble * bytesPerRow / targetBytes)
    math.max(1, math.min(1 << 20, p.toLong)).toInt
  }

  /** Exact two-phase salted sum/count aggregation:
    * groupBy(keys, salt) partial → groupBy(keys) merge. Use when one
    * key dominates (AQE skew-join covers joins; this covers groupBy).
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salt: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"),
        sum("__pcnt").as("cnt"))
  }

  /** Writes both sides bucketed+sorted by the join key into the session
    * catalog (requires a warehouse dir), so subsequent joins on that
    * key are shuffle-free sort-merge joins. Returns the bucketed frames
    * read back from the catalog.
    *
    * Pay-once semantics: if a table of that name is already registered
    * in this JVM's catalog it is REUSED, not rewritten — callers
    * namespace names per dataset (j7 appends a dataset-path hash), so an
    * existing table is always the same data/layout. The write is
    * serialized under a lock so concurrent queries can't race the
    * DROP/mkdir. */
  def bucketedPair(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int, leftName: String, rightName: String)
      : (DataFrame, DataFrame) = {
    def writeBucketed(df: DataFrame, name: String): Unit = {
      // a fresh metastore with a stale warehouse dir (prior JVM) refuses
      // the location — drop metadata AND the directory first
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), name)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
      // r15 optimization (guide §6, layout on write): one FILE per
      // bucket. Spark only propagates the bucketed sortBy order to the
      // scan when every bucket holds a single file (multiple files per
      // bucket would need a merge the scan node does not do), so a
      // multi-task write silently re-pays BOTH SortMergeJoin sorts on
      // every read of the pay-once fixture. Repartitioning by the
      // bucket key's own hash before the write lands each bucket in
      // exactly one writer task ⇒ one file ⇒ the join plan drops its
      // Sort nodes (plans/r15/j7_bucketed_join_{before,after}.txt).
      df.repartition(buckets, col(key)).write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    }
    this.synchronized {
      if (!spark.catalog.tableExists(leftName) ||
          !spark.catalog.tableExists(rightName)) {
        writeBucketed(left, leftName)
        writeBucketed(right, rightName)
      }
    }
    (spark.table(leftName), spark.table(rightName))
  }
}
