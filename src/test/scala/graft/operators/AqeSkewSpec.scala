package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join guard: the engine's scale story handles VALUE skew by
  * design (over-cap LSH/dedup buckets degrade to rank chains —
  * PlanSpec/AnnRecallSpec), but PARTITION skew in ordinary shuffle
  * joins is deliberately left to Spark's runtime re-plan
  * (OptimizeSkewedJoin splits oversized partitions at the advisory
  * size). That division of labor is an assumption worth pinning: if a
  * future session config or Spark upgrade silently disabled the skew
  * rewrite, every equi-join in the engine would regain its straggler.
  * This spec builds a join where one key carries ~99% of the bytes and
  * asserts the executed plan actually took the skew path.
  */
class AqeSkewSpec extends SparkSpec {

  it("a 99%-one-key shuffle join is split by AQE's skew rewrite") {
    val confs = Seq(
      // force a shuffle join (the small side would otherwise broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // test-sized skew thresholds: the defaults target 256 MB
      // partitions; the rewrite logic is identical
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      // coalescing at these tiny sizes would fold the split back
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) carrying 180k payload rows; 2k cold keys. The
      // payload must be INCOMPRESSIBLE — shuffle partition sizes are
      // post-compression, and a constant pad string lz4-compresses the
      // "skewed" partition under any threshold (first attempt measured
      // no skew path at a 256k threshold with 20 MB of constant pad)
      val pad = concat(md5(col("id").cast("string")),
        md5((col("id") + 7).cast("string")),
        md5((col("id") + 13).cast("string")))
      val left = spark.range(0, 182000).select(
        when(col("id") < 180000, 0L).otherwise(pmod(col("id"), lit(2000L)))
          .as("k"),
        pad.as("payload"))
      val right = spark.range(0, 2000).select(
        col("id").as("k"), lit(1L).as("w"))
      // max(payload) keeps the wide column alive through the join
      // shuffle — without it Catalyst prunes the payload pre-exchange
      // and no partition is big enough to look skewed
      val joined = left.join(right, "k").agg(
        count(lit(1)).as("n"), sum("w").as("sw"),
        max("payload").as("mp"))
      // collect() (not head(): head spawns a separate limit execution,
      // leaving THIS queryExecution un-run and its plan non-final)
      val row = joined.collect().head
      // correctness first: every left row's key is in 0..1999, and each
      // matches exactly one right row
      assert(row.getLong(0) == 182000 && row.getLong(1) == 182000,
        row.toString)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"executed plan took no skew path:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
