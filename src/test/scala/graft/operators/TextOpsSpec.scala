package graft.operators

import graft.{SparkSpec, Tables => T}
import graft.operators.SimilarityOps

/** Scale-shape evidence for the MinHash+LSH dedup path: the banded
  * candidate set must grow sub-quadratically in the corpus size —
  * 2-row bands (k=16, bands=8) collide for unrelated pairs at ≈ s² per
  * band and blow up ~O(n²) at 100×; the 4-row bands used by x8 (k=32,
  * bands=8) collide at ≈ s⁴ and stay near-linear.
  */
class TextOpsSpec extends SparkSpec {

  it("the banded signature frame is built once per dataset key") {
    val e = T.embeddings(spark, "/root/testdata/sf0.001")
    val f1 = SimilarityOps.cachedBucketedFrame("spec-frame", e, 4, Seq(42L), 64)
    val f2 = SimilarityOps.cachedBucketedFrame("spec-frame",
      e.limit(1), 4, Seq(42L), 64) // a rebuild would use this frame
    assert(f1 eq f2, "signature frame was rebuilt for the same key")
    assert(f1.storageLevel.useDisk || f1.storageLevel.useMemory,
      "signature frame is not persisted")
  }

  it("x13 simhash banding finds EXACTLY the brute-force hamming<=3 pairs") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val banded = graft.SparkEntry.queries("x13_simhash_neardup")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val fp = T.documents(spark, sf)
      .select(col("doc_id"),
        transform(split(trim(col("text")), "\\s+"),
          t => graft.functions.PolyHash64.polyhash64(t)).as("hs"))
      .select(col("doc_id"), expr(TextOps.simhashSqlOverHs).as("simhash"))
    val a = fp.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val brute = a.crossJoin(
        fp.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .filter(expr("bit_count(sh_a ^ sh_b)") <= 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}: pigeonhole violated")
    assert(brute.nonEmpty, "corpus has no near-dup pairs to find")
  }

  it("x8 banding (rows=4) candidate set grows sub-quadratically") {
    def cands(sf: String): (Long, Long) = {
      val docs = T.documents(spark, s"/root/testdata/$sf")
      (docs.count(),
        TextOps.minhashCandidates(docs, k = 32, bands = 8).count())
    }
    val (n1, c1) = cands("sf0.01")
    val (n2, c2) = cands("sf0.1")
    info(s"banded candidates: n=$n1 -> $c1 pairs, n=$n2 -> $c2 pairs " +
      f"(growth ${c2.toDouble / math.max(c1, 1)}%.1fx vs quadratic " +
      f"${math.pow(n2.toDouble / n1, 2)}%.0fx)")
    val growth = c2.toDouble / math.max(c1, 1)
    val quadratic = math.pow(n2.toDouble / n1, 2)
    assert(growth < quadratic / 2,
      f"candidate growth $growth%.1fx is not sub-quadratic ($quadratic%.0fx)")
  }

  it("x9 fingerprint equals the hand-computed char fold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the same expression the x9 query builds, over controlled input
    val df = Seq((1L, "abc"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    def fold(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 257 + c.toLong) % 1000000007L)
    val expr9 = aggregate(
      transform(filter(split(col("text"), ""), c => c =!= ""),
        c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * lit(257L) + c, lit(1000000007L)))
    val rows = df.select(col("doc_id"), expr9.as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> fold("abc"), 2L -> fold(""), 3L -> fold("a b")))
  }

  it("x14 repetition ratio is 1 - distinct/total and stays in [0,1)") {
    val rows = graft.SparkEntry.queries("x14_repetition")(
        spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nd, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nd <= n && nd > 0)
      assert(math.abs(ratio - (1.0 - nd.toDouble / n)) < 1e-6)
      assert(ratio >= 0 && ratio < 1)
    }
  }

  it("connectedComponents merges transitively and labels by min id") {
    import spark.implicits._
    // chain 1-2-3 (1~3 never pair directly), separate pair 10-11, and a
    // long path 20..26 (diameter 6 — exercises >1 propagation round),
    // plus a cross-link making 26~20 redundant
    val edges = Seq(
      (2L, 1L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L),
      (25L, 26L), (26L, 20L)).toDF("doc_a", "doc_b")
    val got = TextOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L) ++
      (20L to 26L).map(_ -> 20L).toMap
    assert(got == want)
  }

  it("connectedComponents of an empty edge list is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(TextOps.connectedComponents(empty).count() == 0)
  }

  it("x15 top bigrams are count-descending and exercised") {
    val rows = graft.SparkEntry.queries("x15_top_bigrams")(
        spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.head > 1, "top bigram should repeat in the corpus")
    rows.foreach(r => assert(r.getString(0).split(" ").length == 2))
  }

  it("x21 cross-entropy is positive and counts bigrams = tokens - 1") {
    val sf = "/root/testdata/sf0.001"
    val xent = graft.SparkEntry.queries("x21_lm_xent")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ntok = graft.SparkEntry.queries("x2_token_count")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(xent.keySet == ntok.keySet.filter(ntok(_) >= 2))
    xent.foreach { case (id, (nbg, x)) =>
      assert(nbg == ntok(id) - 1, s"doc $id: $nbg bigrams, ${ntok(id)} tokens")
      assert(x > 0 && !x.isInfinite, s"doc $id: xent=$x")
      // add-one smoothing bounds every bigram logprob by ln(vocab+max cu)
      assert(x < 20, s"doc $id: implausible xent=$x")
    }
  }

  it("x22 shard assignment equals a driver-side replay of the running sum") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("x22_token_pack")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // output arrives sorted (source, doc_id); replay the greedy pack
    var prevSource = ""
    var cum = 0L
    rows.foreach { case (source, docId, nt, shard) =>
      if (source != prevSource) { prevSource = source; cum = 0L }
      assert(shard == cum / 4096,
        s"doc $docId in $source: shard=$shard, expected ${cum / 4096}")
      cum += nt
    }
    assert(rows.map(_._1).distinct.length > 1, "needs multiple sources")
  }
}
