package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the overflow-free forms of the two multiplicative hashes after
  * the ×100 blow-up probe crashed the naive `key * 2654435761` product
  * with ARITHMETIC_OVERFLOW at doc_id ≈ 1e10 (BENCH_SCALES.md
  * §beyond-sf0.1). Two claims, both checked against driver-side BigInt
  * arithmetic (which cannot overflow):
  *
  *  1. the split-multiply forms compute the TRUE mathematical value of
  *     (key·2654435761 + seed) mod 2^32 / (id·2654435761) mod 1048573
  *     for ids far past the naive formula's 3.47e9 overflow bound;
  *  2. below that bound they are bit-identical to the naive product, so
  *     every existing split, sample, and DuckDB oracle is unchanged.
  */
class HashOverflowSpec extends SparkSpec {

  private val Mult = BigInt(2654435761L)

  private def refKnuth(key: Long, seed: Long): Long =
    ((BigInt(key) * Mult + seed).mod(BigInt(4294967296L))).toLong

  private def refScramble(id: Long): Long =
    ((BigInt(id) * Mult).mod(BigInt(1048573L))).toLong

  // small ids (naive-formula regime), the naive overflow frontier, and
  // blow-up-probe-scale ids (k·1e8 stride shifts) past it
  private val ids = Seq(0L, 1L, 77L, 999983L, 3_470_000_000L,
    3_500_000_000L, 9_900_000_123L, 99 * 100_000_000L + 999_999L,
    Long.MaxValue / 2654435761L + 1, Long.MaxValue - 1)

  it("knuthHash equals BigInt math for ids past the naive overflow bound") {
    import spark.implicits._
    val got = ids.toDF("id")
      .select(col("id"), RelationalOps.knuthHash(col("id"), 77L).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id => assert(got(id) == refKnuth(id, 77L), s"id=$id") }
  }

  it("knuthHash matches the naive product wherever that doesn't overflow") {
    import spark.implicits._
    val small = ids.filter(_ < Long.MaxValue / 2654435761L)
    val got = small.toDF("id")
      .select(col("id"), RelationalOps.knuthHash(col("id"), 42L).as("h"),
        pmod(col("id") * lit(2654435761L) + lit(42L), lit(4294967296L))
          .as("naive"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, h, naive) => assert(h == naive, s"id=$id") }
  }

  it("the bucket scramble equals BigInt math at any id scale") {
    import spark.implicits._
    // same split form as SimilarityOps.bucketScramble (private there)
    val got = ids.toDF("id")
      .select(col("id"),
        pmod(pmod(col("id"), lit(1048573L)) * lit(2654435761L % 1048573L),
          lit(1048573L)).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id => assert(got(id) == refScramble(id), s"id=$id") }
  }
}
