package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => Fn}
import org.apache.spark.storage.StorageLevel
import graft.operators.RelationalOps
import graft.{Tables => T}
import graft.operators.TextOps

/** The end-to-end corpus-curation pipeline: the individual contract
  * operators (x20 quality sampling → x4 exact dedup → x16 near-dup
  * components → x17 decontamination → x22 sequence packing) COMPOSED into
  * one driver, the way a real pretraining-data run chains them (the
  * reference's own flow is a composed driver too —
  * CNC_AE_model_selection.py:557-582 chains scale → split → train →
  * select rather than isolated calls).
  *
  * Every stage is the same expression-level operator its contract query
  * runs — nothing pipeline-specific is bolted on — and each stage's
  * survivors flow to the next as a doc_id anti-/semi-join, so at 100 TB
  * the whole pipeline stays shuffle-bounded: one md5 shuffle (dedup), the
  * banded-LSH shuffles (near-dup, already sub-quadratic), one shingle
  * semi-join (decon), and the two-level prefix sum (packing). Per-stage
  * attrition (docs + tokens) is the pipeline's observability contract.
  */
object CurationPipeline {

  final case class StageStat(stage: String, docs: Long, tokens: Long)

  private val stopWords =
    Seq("the", "of", "and", "a", "to", "de", "la", "le", "und", "el")

  /** Runs the five curation stages over `sfDir`'s documents table.
    * Returns (packed shards frame, per-stage attrition). `contamMax` is
    * the x17 contamination score above which a doc is dropped — set from
    * the corpus's own contamination quantiles (the x17 + x25/x28 read):
    * the synthetic corpus draws every doc from one shared vocabulary, so
    * unrelated docs already overlap the benchmark split at ~0.38 median /
    * 0.48 p90 3-gram contamination; 0.5 cuts the genuine-overlap tail
    * instead of the noise floor. */
  def run(spark: SparkSession, sfDir: String,
      contamMax: Double = 0.5): (DataFrame, Seq[StageStat]) =
    build(spark, sfDir, contamMax, persist = true)

  /** The pipeline as ONE composable query (no stats actions, no
    * persists): the packed survivors frame — what the oracled
    * `x29_curation_pipeline` contract query runs and DuckDB replays. */
  def curate(spark: SparkSession, sfDir: String,
      contamMax: Double = 0.5): DataFrame =
    build(spark, sfDir, contamMax, persist = false)._1

  private def build(spark: SparkSession, sfDir: String,
      contamMax: Double, persist: Boolean): (DataFrame, Seq[StageStat]) = {
    val toks = split(trim(col("text")), "\\s+")
    def mat(df: DataFrame): DataFrame =
      if (persist) df.persist(StorageLevel.MEMORY_AND_DISK) else df

    // stage 0 — ingest: one scan computing the token counts every later
    // stage reuses (text is carried only as far as the md5 stage needs)
    val docs0 = mat(T.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"),
        size(toks).as("nt")))

    def stat(name: String, df: DataFrame): StageStat = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(sum("nt"), lit(0L)).as("t")).head()
      StageStat(name, r.getLong(0), r.getLong(1))
    }

    // stage 1 — quality resample (the x20 rule): stopword-ratio band ×
    // deterministic multiplicative-hash keep. Pure per-row expressions.
    // The content hash stage 2 needs is computed HERE, map-side, so the
    // full text column never crosses an exchange: carrying text through
    // the stage-2/3/4 joins was measured as the x1000 decade's spill
    // driver (two ~10 GB sort spills of text-bearing rows per pass —
    // BENCH_SCALES.md §x29-profile); every shuffled row is now ≤ ~60 B.
    val sr = round(
      size(Fn.filter(toks, t => t.isin(stopWords: _*))).cast("double")
        / greatest(size(toks), lit(1)), 6)
    val quality = docs0
      .withColumn("band",
        when(sr >= 0.08, "high").when(sr >= 0.04, "mid").otherwise("low"))
      .withColumn("u", RelationalOps.knuthHash(col("doc_id"), 77L))
      .filter(col("u") <
        when(col("band") === "high", 1.0)
          .when(col("band") === "mid", 0.5)
          .otherwise(0.1) * lit(4294967296.0))
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        col("nt"))
    val qualityM = mat(quality)

    // stage 2 — exact dedup (the x4 rule): keep min doc_id per content
    // hash, over the quality survivors. One hash shuffle (32-char md5,
    // not the document body).
    val exact = qualityM
      .groupBy("h")
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val d2 = mat(qualityM.select("doc_id", "source", "nt")
      .join(exact, Seq("doc_id"), "left_semi"))

    // stage 3 — near-dup canonicalization (the x16 components): corpus-
    // wide MinHash-verified pairs → connected components → drop every
    // non-canonical member (component label = min doc_id).
    val comps = TextOps.connectedComponents(
      TextOps.cachedVerifiedPairs(spark, sfDir, k = 16, bands = 4,
        threshold = 0.5).select("doc_a", "doc_b"))
    val nonCanonical = comps.filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    val d3 = mat(d2.join(nonCanonical, Seq("doc_id"), "left_anti"))

    // stage 4 — decontamination (the x17 rule): drop the benchmark split
    // itself (doc_id % 20 = 0, the synthetic eval stand-in) and every
    // training doc whose distinct-shingle overlap with it exceeds
    // `contamMax`. One shingle-hash semi-join, AQE-broadcastable.
    val ex = TextOps.cachedHashedShingles(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(col("hs"))).as("h"))
    val bench = ex.filter(col("doc_id") % 20 === 0)
      .select("h").distinct().withColumn("hit", lit(1))
    val contaminated = ex.filter(col("doc_id") % 20 =!= 0)
      .join(bench, Seq("h"), "left")
      .groupBy("doc_id")
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double")
        / count(lit(1))).as("c"))
      .filter(col("c") > contamMax)
      .select("doc_id")
    val d4 = mat(d3.filter(col("doc_id") % 20 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti"))

    // stage 5 — sequence packing (the x22 prefix sum) over the survivors
    val packed = TextOps.packShards(d4.select("source", "doc_id", "nt"))

    // the per-stage counts are ACTIONS — only the reporting run pays them
    val stats = if (!persist) Seq.empty else Seq(
      stat("0_ingest", docs0),
      stat("1_quality_sample", qualityM),
      stat("2_exact_dedup", d2),
      stat("3_neardup_canonical", d3),
      stat("4_decontaminated", d4))
    (packed, stats)
  }

  /** Attrition table + shard summary, markdown-formatted. */
  def report(stats: Seq[StageStat], packed: DataFrame): String = {
    val shards = packed.agg(
      countDistinct("source", "shard").as("n_shards"),
      coalesce(sum("nt"), lit(0L)).as("tokens")).head()
    val sb = new StringBuilder
    sb ++= "| stage | docs | tokens | docs kept | tokens kept |\n"
    sb ++= "|---|---|---|---|---|\n"
    val first = stats.head
    stats.foreach { s =>
      val dk = if (first.docs == 0) 0.0 else 100.0 * s.docs / first.docs
      val tk = if (first.tokens == 0) 0.0 else 100.0 * s.tokens / first.tokens
      sb ++= f"| ${s.stage} | ${s.docs} | ${s.tokens} | $dk%.1f%% | $tk%.1f%% |%n"
    }
    sb ++= f"%n**Packed**: ${shards.getLong(0)} shards of 4096 tokens " +
      f"(${shards.getLong(1)} surviving tokens).%n"
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (packed, stats) = run(spark, sfDir)
    val out = report(stats, packed)
    val secs = (System.nanoTime() - t0) / 1e9
    println(out)
    println(f"pipeline wall time: $secs%.1f s on $sfDir")
    spark.stop()
  }
}
