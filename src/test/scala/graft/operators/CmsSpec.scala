package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x35's count-min sketch: the overestimate-only guarantee, the
  * per-shard fixture's merge algebra, and the operational CONTRAST
  * with the HLL registers — sum-merge is associative/commutative
  * (shard order free) but NOT idempotent, so the CMS fixture requires
  * exactly-once shard ingestion where HLL tolerates replays. */
class CmsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  it("estimates are overestimate-only and exact for unsaturated cells") {
    val rows = graft.SparkEntry.queries("x35_cms_freq")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    // the CMS hard guarantee: min over d counters never undercounts
    rows.foreach { case (g, ex, est, over) =>
      assert(est >= ex, s"$g: CMS must never undercount ($est < $ex)")
      assert(over == est - ex)
    }
    // at this corpus (~N distinct tokens << d*w cells) collisions are
    // rare: the top-10 overestimates stay a tiny fraction of the count
    val total = rows.map(_._2).sum
    assert(rows.map(_._4).sum <= total / 10,
      s"implausible collision mass: ${rows.map(_._4).sum} over $total")
  }

  it("z24's streamed CMS obeys the same overestimate-only guarantee " +
      "and its heavy-hitter ranks are exact at this sparsity") {
    val rows = graft.SparkEntry.queries("z24_stream_cms")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (u, ex, est, over) =>
      assert(est >= ex, s"user $u: CMS must never undercount ($est < $ex)")
      assert(over == est - ex && over >= 0)
    }
    // exact ranks are strictly positive and sorted the deterministic way
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }

  it("shard-merged sketch equals the global single-pass sketch (sum is " +
      "associative + commutative), but a replayed shard double-counts " +
      "(NOT idempotent - the contrast with the HLL registers)") {
    val sharded = TextOps.cachedCmsSketch(spark, sf)
    assert(sharded.select("shard").distinct().count() > 1)
    val merged = sharded.groupBy("rw", "cl").agg(sum("cnt").as("cnt"))
    // independent global pass: same hash family, no shard split
    val global = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("tk"))
      .select(graft.functions.PolyHash64.polyhash64(col("tk")).as("h"))
      .select(explode(array((0 until TextOps.CmsD).map { j =>
        struct(lit(j).as("rw"),
          pmod(col("h").bitwiseAND(lit(4294967295L)) +
            lit(j.toLong) * expr("shiftrightunsigned(h, 32)"),
            lit(TextOps.CmsW.toLong)).as("cl"))
      }: _*)).as("rc"))
      .groupBy(col("rc.rw").as("rw"), col("rc.cl").as("cl"))
      .agg(count(lit(1)).as("cnt"))
    assert(merged.count() > 0)
    assert(merged.except(global).count() == 0 &&
      global.except(merged).count() == 0,
      "shard-merged CMS must equal the global single-pass sketch")
    // replay: duplicating a shard inflates exactly its cells - the
    // merge is provably NOT replay-tolerant, unlike max(rmax)
    val replayed = sharded.unionAll(sharded.filter(col("shard") === 0))
      .groupBy("rw", "cl").agg(sum("cnt").as("cnt"))
    assert(replayed.except(merged).count() > 0,
      "a replayed shard must change the sketch (exactly-once contract)")
  }
}
