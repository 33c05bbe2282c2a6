package graft.etl

import graft.{ScaleProbe, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The blow-up generator's contract is STATISTICAL scale-invariance
  * (ScaleProbe scaladoc): growth probes over its output are only evidence
  * about data volume if the corpus's duplicate fraction, vector cluster
  * structure, and per-user event profile are preserved — these specs pin
  * exactly that, on sf0.001 at factor 3.
  */
class ScaleProbeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  describe("ScaleProbe.blowUpDocuments") {
    it("multiplies rows, keeps ids unique, and preserves the exact-dup fraction") {
      val base = Tables.documents(spark, sf)
      val blown = ScaleProbe.blowUpDocuments(base, 3).cache()
      val n = base.count()
      assert(blown.count() === 3 * n)
      assert(blown.select("doc_id").distinct().count() === 3 * n)
      // dup fraction: docs sharing their text with ANOTHER doc
      def dupFrac(df: org.apache.spark.sql.DataFrame): Double = {
        val total = df.count().toDouble
        val dups = df.groupBy("text").count().filter(col("count") >= 2)
          .agg(sum("count")).collect()(0)
        (if (dups.isNullAt(0)) 0L else dups.getLong(0)) / total
      }
      assert(math.abs(dupFrac(blown) - dupFrac(base)) < 1e-9,
        "word salting must not create cross-copy duplicates nor lose in-copy ones")
      // copies are content-distinct: distinct texts scale with the factor
      val baseDistinct = base.select("text").distinct().count()
      assert(blown.select("text").distinct().count() === 3 * baseDistinct)
      // n_chars stays consistent with the salted text
      assert(blown.filter(length(col("text")) =!= col("n_chars")).count() === 0)
      blown.unpersist()
    }
  }

  describe("ScaleProbe.blowUpEmbeddings") {
    it("keeps vectors distinct but within ~2% of their source coordinates") {
      val base = Tables.embeddings(spark, sf)
      val blown = ScaleProbe.blowUpEmbeddings(base, 3).cache()
      assert(blown.count() === 3 * base.count())
      assert(blown.select("vec_id").distinct().count() === blown.count())
      // no two copies of the same source vector are equal...
      val eq = blown
        .withColumn("src", pmod(col("vec_id"), lit(100000000L)))
        .groupBy("src").agg(countDistinct(col("embedding")).as("nd"),
          count(lit(1)).as("n"))
        .filter(col("nd") =!= col("n")).count()
      assert(eq === 0, "per-copy perturbation must make every copy distinct")
      // ...yet every coordinate moved by at most 11*2e-3 (cluster-preserving)
      val maxDelta = blown
        .withColumn("src", pmod(col("vec_id"), lit(100000000L)))
        .join(base.select(col("vec_id").as("src"), col("embedding").as("be")), "src")
        .select(aggregate(zip_with(col("embedding"), col("be"),
          (a, b) => abs(a - b)), lit(0.0f), (acc, x) => greatest(acc, x)).as("d"))
        .agg(max("d")).collect()(0).getFloat(0)
      assert(maxDelta <= 11 * 2e-3f + 1e-6f)
      blown.unpersist()
    }

    it("stays cross-copy distinct past factor 24 (no perturbation period)") {
      // The r8 perturbation pmod(k*131 + i*31, 23) was periodic in the
      // copy index k with period 23 — copies k and k+23 got identical
      // offsets, so factor >= 24 contained exact duplicate vectors and
      // the x100/x1000 BENCH_SCALES growth numbers ran over degenerate
      // LSH/IVF buckets. Factor 26 exercises the first wrap-around decade.
      val base = Tables.embeddings(spark, sf).limit(40)
      val blown = ScaleProbe.blowUpEmbeddings(base, 26).cache()
      assert(blown.count() === 26 * 40)
      val collided = blown
        .withColumn("src", pmod(col("vec_id"), lit(100000000L)))
        .groupBy("src").agg(countDistinct(col("embedding")).as("nd"),
          count(lit(1)).as("n"))
        .filter(col("nd") =!= col("n")).count()
      assert(collided === 0,
        "copies k and k+23 must not share a perturbation (hash-keyed, not affine)")
      blown.unpersist()
    }
  }

  describe("ScaleProbe.blowUpEvents") {
    it("scales user cardinality linearly over the same time span") {
      val base = Tables.events(spark, sf)
      val blown = ScaleProbe.blowUpEvents(base, 3).cache()
      assert(blown.count() === 3 * base.count())
      assert(blown.select("user_id").distinct().count()
        === 3 * base.select("user_id").distinct().count())
      val Array(bmin, bmax) = base.agg(min("ts"), max("ts")).collect()(0)
        .toSeq.toArray
      val Array(pmin2, pmax2) = blown.agg(min("ts"), max("ts")).collect()(0)
        .toSeq.toArray
      assert(bmin == pmin2 && bmax == pmax2, "time span must not stretch")
      blown.unpersist()
    }
  }
}
