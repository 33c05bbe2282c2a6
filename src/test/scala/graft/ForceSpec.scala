package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Canary for the honest-forcing invariant (VERDICT r9 ask #2).
  *
  * Round 9 found that `df.count()` let Catalyst eliminate
  * cardinality-preserving subtrees wholesale — a left join whose right
  * side is unique on the join key loses the entire right subtree once
  * its columns are pruned — so several rounds of bench rows timed plans
  * with their real work optimized away (x17 ×1000: "2.0 s" hollow vs
  * 51.8 s real). `Force` was introduced to execute the query's OWN
  * physical plan (`queryExecution.toRdd.count()`).
  *
  * This spec pins BOTH directions with a task-side accumulator planted
  * under exactly the x17 join shape (left join onto a distinct'd right
  * side, aggregated above — TextOps.scala x17_contamination):
  *   1. `Force(df)` executes the prunable right subtree, and
  *   2. `df.count()` does NOT (the optimizer still prunes it).
  * If (2) ever fails, the optimizer changed and the canary's premise is
  * gone — re-validate Force against the new optimizer before trusting
  * any bench delta. If (1) fails, a "faster" forcing path re-opened the
  * r9 hole and every bench number it produced is suspect.
  */
class ForceSpec extends SparkSpec {

  /** x17's shape: left side 1000 rows, right side distinct on the join
    * key (so provably unique), joined left and aggregated above with
    * only-left grouping keys. The accumulator ticks once per right-base
    * row ACTUALLY computed on an executor. */
  private def canary(acc: LongAccumulator): DataFrame = {
    import spark.implicits._
    val left = spark.range(0, 1000)
      .select(col("id"), (col("id") % 97).as("h"))
    val rightBase = spark.sparkContext
      .parallelize(0L until 97L, 2)
      .map { v => acc.add(1); v }
      .toDF("h").distinct().withColumn("hit", lit(1))
    left.join(rightBase, Seq("h"), "left")
      .groupBy("id")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hit"))
  }

  it("Force executes the cardinality-preserving right subtree") {
    val acc = spark.sparkContext.longAccumulator("force-canary-force")
    val n = Force(canary(acc))
    assert(n == 1000L)
    assert(acc.value > 0L,
      "Force() skipped the prunable right subtree — the honest-forcing " +
        "hole from round 9 has re-opened; no bench number from this " +
        "forcing path can be trusted")
  }

  it("count() still prunes it (the canary's premise holds)") {
    val acc = spark.sparkContext.longAccumulator("force-canary-count")
    val n = canary(acc).count()
    assert(n == 1000L)
    assert(acc.value == 0L,
      "df.count() now executes the unique-key left join's right side — " +
        "the optimizer behavior this canary (and the r9 postmortem) is " +
        "premised on has changed; re-validate Force against it")
  }
}
