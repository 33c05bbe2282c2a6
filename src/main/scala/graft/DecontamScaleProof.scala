package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BlockedBloom, BloomMightContain}
import graft.operators.TextOps

/** Decontamination-shape proof (SCALE.md §Dedup/text, x17 vs x30): times
  * the plain hash-join shape against the bloom-prefiltered shape on the
  * SAME corpus at a PARAMETERIZED benchmark rate, because the two shapes
  * win in different data regimes and the contract corpus only exercises
  * one of them:
  *
  *  - the x17/x30 contract split (`doc_id % 20`) on the ×1000 blow-up is
  *    38% contaminated (measured — the blow-up duplicates content across
  *    splits), so prefiltering barely filters and the bench side is
  *    broadcastable anyway: the plain join must win;
  *  - a REAL 100 TB decontamination pass probes a benchmark suite that
  *    is a vanishing fraction of the corpus (sparse split, e.g.
  *    `doc_id % 2000`), where the prefilter drops ~99% of shingles
  *    before any exchange: the bloom shape must hold its ground and its
  *    candidate volume must track the measured selectivity.
  *
  * Prints, per benchMod: selectivity (candidates/train shingles), warm
  * wall times of both shapes, and the candidate row count. Run:
  * `java -cp <cp> graft.DecontamScaleProof <dir> [benchMod ...]`
  * (defaults: 20 2000). Warm = second run of the same shape (caches
  * populated, sketch memoized).
  */
object DecontamScaleProof {

  private def shapes(spark: SparkSession, d: String, benchMod: Long):
      (DataFrame, DataFrame, DataFrame) = {
    val ex = TextOps.cachedHashedShingles(spark, d)
      .select(col("doc_id"), explode(array_distinct(col("hs"))).as("h"))
    val train = ex.filter(col("doc_id") % benchMod =!= 0)
    val bench = ex.filter(col("doc_id") % benchMod === 0)
      .select("h").distinct()

    // x17 shape: one hash left-join, then per-doc aggregation
    val plain = train
      .join(bench.withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))

    // x30 shape: blocked-bloom prefilter below an exact confirm join,
    // denominators off the un-exploded arrays. The fit runs once here
    // (outside the timed warm passes — x30's steady state memoizes it).
    val bloom = BlockedBloom.fit(bench, "h", math.max(bench.count(), 64L))
    val candidates = train.filter(
      BloomMightContain.mightContain(col("h"), bloom))
    val denom = TextOps.cachedHashedShingles(spark, d)
      .filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id"),
        size(array_distinct(col("hs"))).cast("long").as("n_shingles"))
    val hits = candidates.join(bench, Seq("h"), "inner")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    val bloomShape = denom.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
    (plain, bloomShape, candidates)
  }

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mods = if (args.length > 1) args.tail.map(_.toLong).toSeq
               else Seq(20L, 2000L)
    val spark = Sessions.builder("local[" +
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16") + "]",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .appName("graft-decontam-proof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("[decontam] benchMod,train_shingles,candidates,selectivity," +
      "plain_warm_s,bloom_warm_s")
    // Force the WHOLE pipeline: a bare count() lets Catalyst eliminate
    // the outer join (right side unique on the key, columns pruned) and
    // the proof would time nothing. Summing both aggregate columns
    // keeps every join and aggregation live.
    def force(df: DataFrame): Long = {
      val r = df.agg(sum(col("n_shingles")), sum(col("n_hit"))).collect()(0)
      r.getLong(0) + r.getLong(1)
    }
    for (mod <- mods) {
      val (plain, bloomShape, candidates) = shapes(spark, dir, mod)
      // warm both: first pass populates the shingle cache + sketch
      force(plain); val (tp, np) = timed(force(plain))
      force(bloomShape); val (tb, nb) = timed(force(bloomShape))
      val nCand = candidates.count()
      val nTrain = TextOps.cachedHashedShingles(spark, dir)
        .filter(col("doc_id") % mod =!= 0)
        .select(explode(array_distinct(col("hs")))).count()
      require(np == nb,
        s"shape disagreement: plain checksum $np != bloom checksum $nb")
      println(f"[decontam] $mod,$nTrain,$nCand," +
        f"${nCand.toDouble / nTrain}%.4f,$tp%.2f,$tb%.2f  " +
        f"(checksums agree: $np)")
    }
    spark.stop()
  }
}
