package graft

/** Pins `QueryTime.contentChecksum` — the order-insensitive triple
  * fold (bit-xor / wrapping sum / count over per-row xxhash64) that
  * asserts separate-JVM probe runs bit-identical to fused runs where
  * no DuckDB oracle reaches. The load-bearing case is the ADVICE r10
  * hole: xor alone cannot see even-multiplicity differences (dropping
  * or doubling a duplicated row PAIR cancels out of the xor), so the
  * checksum must distinguish such multisets via the sum/count folds. */
class ChecksumSpec extends SparkSpec {

  import spark.implicits._

  private def chk(rows: Seq[(Int, String)]) =
    QueryTime.contentChecksum(rows.toDF("k", "v"))

  it("is order- and partitioning-insensitive") {
    val rows = (1 to 97).map(i => (i, s"v$i"))
    val a = QueryTime.contentChecksum(rows.toDF("k", "v").repartition(7))
    val b = QueryTime.contentChecksum(
      scala.util.Random.shuffle(rows).toDF("k", "v").coalesce(1))
    assert(a == b)
  }

  it("distinguishes multisets that differ by an even-multiplicity " +
      "duplicate pair (the xor-only blind spot, ADVICE r10)") {
    val base = Seq((1, "a"), (2, "b"), (3, "c"))
    val dupPair = base ++ Seq((2, "b"), (2, "b"))
    // xor of the two extra identical row hashes is 0 — the first fold
    // alone would collide; count (and sum) must separate them
    assert(chk(base) != chk(dupPair))
    // same count, different content: sum/xor folds must separate
    val swapped = Seq((1, "a"), (2, "b"), (4, "d"))
    assert(chk(base) != chk(swapped))
  }

  it("reports EMPTY for zero-row results") {
    assert(chk(Seq.empty) == "EMPTY")
  }
}
