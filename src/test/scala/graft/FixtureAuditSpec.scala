package graft

import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Cross-checks `Bench.FixtureBacked` — the hand-maintained list of
  * queries whose steady-state bench timing reads a pay-once persisted
  * fixture — against what the plans actually do (VERDICT r11 ask #7:
  * the list was maintained by hand, so a new fixture consumer could
  * silently under-report its cost).
  *
  * Two directions:
  *  - any query whose optimized plan reads a cached relation MUST be
  *    declared (under-reporting is the failure mode that matters: the
  *    bench would present fixture-amortized numbers as fixture-free);
  *  - any declared query backed by a DataFrame cache must actually
  *    read one (a stale declaration over-reports and hides a plan
  *    regression that silently dropped the fixture).
  *
  * Declared queries whose fixture is NOT a DataFrame cache are listed
  * in [[nonDfCacheFixtures]] with the artifact kind; they are audited
  * only in the first direction.
  */
class FixtureAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** FixtureBacked members whose pay-once artifact is not a cached
    * DataFrame, so no InMemoryRelation appears in their plans. */
  private val nonDfCacheFixtures: Map[String, String] = Map(
    "j6_union_all" -> "bucketed on-disk tables (saveAsTable layout)",
    "j7_bucketed_join" -> "bucketed on-disk tables (saveAsTable layout)",
    "y5_ivf_ann" -> "fitted IVF centroids (driver-side model cache)",
    "y6_pq_ann" -> "fitted PQ codebooks (driver-side model cache)",
    "y7_ivfpq_ann" -> "fitted IVF centroids + PQ codebooks",
    "y9_quantize_2l" -> "fitted two-level quantizer (driver-side model cache)")

  /** FixtureBacked members that consume their cached fixture EAGERLY at
    * query-construction time (the union-find driver fast path collects
    * the verified-pairs fixture under the heap/maxResultSize gate and
    * returns a driver-built frame), so below the gate the RETURNED plan
    * shows no cached read; the distributed path above the gate does.
    * Audited in the under-reporting direction only. */
  private val eagerFixtureConsumers: Map[String, String] = Map(
    "x16_dup_components" -> "verified-pairs fixture via driver union-find",
    "x26_semantic_components" -> "LSH-bucket pairs via driver union-find",
    "x32_canonical_docs" -> "verified-pairs fixture via driver union-find",
    "x33_pagerank" -> ("verified-pairs fixture consumed at construction " +
      "(eager localCheckpoint per power iteration)"))

  private def cachedRelCount(name: String): Int =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case r: InMemoryRelation => r
      }.size

  it("every query reading a cached fixture is declared fixture-backed, " +
      "and every declared DF-cache fixture is actually read") {
    // Build the heaviest fixture consumers FIRST so the per-dataset
    // memos are populated — a fixture that registers its persist level
    // at build time shows as InMemoryRelation in every later consumer's
    // plan regardless of order, but building x21 first keeps the audit
    // deterministic even if a future fixture defers registration.
    Bench.FixtureBacked.foreach(n => SparkEntry.queries(n)(spark, sf))

    val declared = Bench.FixtureBacked.toSet
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val reads = cachedRelCount(name) > 0
      if (reads && !declared(name))
        offenders += s"$name reads a cached relation but is NOT in " +
          "Bench.FixtureBacked — its bench number silently hides the " +
          "fixture build cost"
      if (!reads && declared(name) && !nonDfCacheFixtures.contains(name) &&
          !eagerFixtureConsumers.contains(name))
        offenders += s"$name is declared fixture-backed but its plan " +
          "reads NO cached relation — stale declaration or a plan " +
          "regression dropped the fixture"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  it("the exception maps stay inside the declared list") {
    val ghosts = (nonDfCacheFixtures.keySet ++ eagerFixtureConsumers.keySet) --
      Bench.FixtureBacked.toSet
    assert(ghosts.isEmpty,
      s"exceptions for queries not declared fixture-backed: $ghosts")
  }
}
