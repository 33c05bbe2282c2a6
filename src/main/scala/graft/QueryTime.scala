package graft

import org.apache.spark.sql.SparkSession

/** Dev driver: time individual contract queries in isolation.
  *
  *   sbt "runMain graft.QueryTime /root/testdata/sf0.1 x15_top_bigrams y4_lsh_ann"
  *
  * Each query runs twice (cold, warm) after an untimed table warmup, so
  * per-query cost separates from session/file-index init. Complements
  * Bench (whole-suite, driver contract) and PlanAudit (plan shapes).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "documents", "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[qtime] $name: UNKNOWN")
        case Some(fn) =>
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            ((System.nanoTime() - t0) / 1e9, n)
          }
          println(f"[qtime] $name%-22s cold=${times(0)._1}%6.2fs " +
            f"warm=${times(1)._1}%6.2fs rows=${times(1)._2}")
      }
    }
    spark.stop()
  }
}
