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
  *
  * FORCED-REGIME mode (r13, VERDICT ask #1): a second argument forces
  * the quantizer ceiling to `cap` cells and runs two arms —
  *  - `banded-forced`: the pre-r13 ceiling behavior (flat fit pinned
  *    AT the cap, cells regrow past the pair cap, the verdict join
  *    degrades to its ±chainK band) — this box cannot hold the
  *    n ≈ 16.8 M vectors where the REAL 4096 ceiling saturates, so
  *    the probe recreates the regime by shrinking the ceiling until
  *    today's blow-up corpora overflow it the same way;
  *  - `sampled`: the two-level k ∝ n fit (no ceiling) over the SAME
  *    corpus — cells return to ~256 members and the exact triangle is
  *    the operating regime again.
  * Same-cell multi-kept groups (`multi_kept_groups` minus
  * `all_kept_in_distinct_cells`) are the banded arm's misses; the
  * sampled arm must measure ZERO of them.
  *
  * Run: `sbt "runMain graft.SemDedupProbe /tmp/graft_probe_x1000 64"`
  * → BENCH_SCALES.md §r13 quantizer ceiling.
  */
object SemDedupProbe {

  private val Stride = 100_000_000L

  /** Run `body` with the dedup-quantizer routing props pinned, restoring
    * the previous values after (the assignment caches key on the props,
    * so arms in one JVM never read each other's frames). */
  private def withRouting[A](cap: Int, scaledFit: Boolean)(body: => A): A = {
    val keys = Seq("graft.semdedup.quantCap", "graft.semdedup.scaledFit")
    val prev = keys.map(k => k -> sys.props.get(k))
    sys.props("graft.semdedup.quantCap") = cap.toString
    sys.props("graft.semdedup.scaledFit") = scaledFit.toString
    try body
    finally prev.foreach {
      case (k, Some(v)) => sys.props(k) = v
      case (k, None) => sys.props.remove(k)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_probe_x100")
    val forcedCap = args.lift(1).map(_.toInt)
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
    forcedCap match {
      case Some(cap) =>
        withRouting(cap, scaledFit = false) {
          stats(s"banded-forced-cap$cap",
            SparkEntry.queries("y8_semdedup")(spark, dir))
        }
        withRouting(cap, scaledFit = true) {
          stats(s"sampled-cap$cap",
            SparkEntry.queries("y8_semdedup")(spark, dir))
        }
      case None =>
        stats("banded", SparkEntry.queries("y8_semdedup")(spark, dir))
        stats("exact", SimilarityOps.semDedupVerdicts(
          SimilarityOps.cachedSemDedupRanked(spark, dir), cap = Int.MaxValue))
    }
    spark.stop()
  }
}
