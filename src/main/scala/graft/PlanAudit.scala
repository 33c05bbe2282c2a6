package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries and
  * grep-able plan assertions (pushdown reached the scan, broadcast
  * chosen for small sides, TakeOrderedAndProject for top-k). Run:
  * sbt "runMain graft.PlanAudit [sfDir] [query...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("s1_scan_project", "j1_equi_join", "p1_semi_join",
        "o1_topk", "y1_cosine_topk", "a2_group_count", "sp1_stratified_split",
        "x4_dedup_exact", "x6_minhash_dedup", "z3_events_hourly")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // mirror the bench session's conf (Sessions.builder) so audited
    // plans are the plans the bench runs — incl. the bucketed-scan
    // ordering conf j7's sort elision depends on
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n========== $n ==========")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
