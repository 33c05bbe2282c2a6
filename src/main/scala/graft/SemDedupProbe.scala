package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** SemDeDup answer quality at probe scale: the BENCH_SCALES blow-ups
  * establish y8's TIME behavior across decades; this measures whether
  * the capped chain arm still FINDS the duplicates there — a sub-
  * quadratic dedup that stops catching near-dups is not an
  * optimization (the AnnRecallProbe argument, applied to dedup).
  *
  * The ScaleProbe blow-up is itself the ground truth: every source
  * vector spawns `factor − 1` jittered near-copies (±0.022 per-dim
  * hash perturbation, cosine ≈ 0.999 within a copy group), so a copy
  * GROUP (vec_id mod the 1e8 id stride) is a known near-duplicate set.
  * Reported per scale:
  *  - kept total — must stay O(source corpus), not O(blown corpus);
  *  - groups with ≥ 2 kept members = MISSED duplicates (a pair of
  *    near-identical copies both surviving) — the chain arm's miss
  *    count, exactly what the banded triangle could in principle lose
  *    vs the full one;
  *  - groups with ≥ 1 kept member that ALSO lost members to other
  *    groups' representatives is fine (SemDeDup prunes cluster
  *    redundancy, not only exact-copy groups).
  *
  * Run: `sbt "runMain graft.SemDedupProbe /tmp/graft_probe_x100"`
  * (corpus from ScaleProbe). Findings → BENCH_SCALES.md §r12 y8.
  */
object SemDedupProbe {

  private val Stride = 100_000_000L

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_probe_x100")
    val spark = Sessions.builder("local[16]", "32")
      .appName("graft-semdedup-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stats(tag: String, verdicts: org.apache.spark.sql.DataFrame): Unit = {
      val v = verdicts.withColumn("grp", pmod(col("vec_id"), lit(Stride)))
      val total = v.count()
      val kept = v.filter(col("kept") === 1L)
      val keptN = kept.count()
      val groups = v.select("grp").distinct().count()
      val multiKept = kept.groupBy("grp")
        .agg(count(lit(1)).as("k")).filter(col("k") >= 2)
      val missed = multiKept.count()
      val worst = multiKept.agg(coalesce(max("k"), lit(0L))).head().getLong(0)
      // a group whose KEPT members sit in ≥2 distinct cells was split by
      // the quantizer — cluster-scoped dedup cannot see across cells (the
      // paper's scoping, not the chain's); same-cell multi-kept is the
      // chain arm's own miss
      val multiCellKept = kept.groupBy("grp")
        .agg(countDistinct("cell").as("c"), count(lit(1)).as("k"))
        .filter(col("k") >= 2)
      val splitOnly = multiCellKept.filter(col("c") === col("k")).count()
      println(f"[semdedup] arm=$tag dir=$dir total=$total kept=$keptN " +
        f"groups=$groups multi_kept_groups=$missed worst_group_kept=$worst " +
        f"all_kept_in_distinct_cells=$splitOnly " +
        f"kept_frac=${keptN.toDouble / total}%.6f")
    }
    stats("banded", SparkEntry.queries("y8_semdedup")(spark, dir))
    stats("exact", SimilarityOps.semDedupVerdicts(
      SimilarityOps.cachedSemDedupRanked(spark, dir), cap = Int.MaxValue))
    spark.stop()
  }
}
