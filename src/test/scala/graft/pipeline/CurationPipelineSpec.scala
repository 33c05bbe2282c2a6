package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed curation driver: the contract operators chained end to
  * end must (a) only ever shrink the corpus, (b) keep exactly the
  * canonical member of every near-dup cluster, (c) drop the benchmark
  * split entirely, and (d) pack survivors into dense shards. */
class CurationPipelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val (packed, stats) = CurationPipeline.run(spark, sf)
  private lazy val packedRows = packed.collect()

  describe("CurationPipeline") {
    it("attrition is monotone: every stage only removes docs and tokens") {
      assert(stats.map(_.stage) === Seq("0_ingest", "1_quality_sample",
        "2_exact_dedup", "3_neardup_canonical", "4_decontaminated"))
      stats.sliding(2).foreach { case Seq(a, b) =>
        assert(b.docs <= a.docs, s"${b.stage} grew docs vs ${a.stage}")
        assert(b.tokens <= a.tokens, s"${b.stage} grew tokens vs ${a.stage}")
      }
      assert(stats.head.docs > 0 && stats.last.docs > 0)
    }

    it("no surviving doc is a non-canonical near-dup cluster member") {
      import graft.operators.TextOps
      val nonCanon = TextOps.connectedComponents(
          TextOps.cachedVerifiedPairs(spark, sf, k = 16, bands = 4,
            threshold = 0.5).select("doc_a", "doc_b"))
        .filter(col("doc_id") =!= col("component"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val surviving = packedRows.map(_.getLong(1)).toSet
      assert(surviving.intersect(nonCanon).isEmpty)
    }

    it("the benchmark split (doc_id % 20 = 0) never reaches packing") {
      assert(!packedRows.exists(_.getLong(1) % 20 == 0))
    }

    it("shard ids equal a local replay of the per-source running sum") {
      packedRows.groupBy(_.getString(0)).foreach { case (src, rows) =>
        var prefix = 0L
        rows.sortBy(_.getLong(1)).foreach { r =>
          assert(r.getLong(3) === prefix / 4096,
            s"$src doc ${r.getLong(1)}: shard ${r.getLong(3)} != " +
              s"${prefix / 4096}")
          prefix += r.getInt(2) // nt is Spark size() — IntegerType
        }
      }
    }

    it("packed tokens equal the decontaminated stage's tokens") {
      val packedTokens = packedRows.map(_.getInt(2).toLong).sum
      assert(packedTokens === stats.last.tokens)
      assert(packedRows.length.toLong === stats.last.docs)
    }
  }
}
