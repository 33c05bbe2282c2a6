package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  describe("Product quantization (Jégou et al. 2011 — IVF-PQ codebook half)") {

    it("packs nearest-centroid codes per subspace (hand fixture)") {
      import spark.implicits._
      val model = Pq.PqModel(2, 2, Seq(
        Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
        Seq(Seq(0.0, 0.0), Seq(-1.0, -1.0))))
      val df = Seq(
        Seq(0.9, 0.9, -0.9, -0.9),  // sub0→c1, sub1→c1  => 1 | 1<<4 = 17
        Seq(0.1, 0.1, 0.1, 0.1),    // sub0→c0, sub1→c0  => 0
        Seq(1.0, 1.0, 0.2, 0.2)     // sub0→c1, sub1→c0  => 1
      ).toDF("v")
      val got = df.select(Pq.encode(col("v"), model).as("c"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(17L, 0L, 1L))
    }

    it("breaks distance ties toward the lowest centroid index") {
      import spark.implicits._
      val model = Pq.PqModel(1, 2, Seq(
        Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0))))
      // equidistant from both centroids → code 0
      val got = Seq(Seq(0.0, 5.0)).toDF("v")
        .select(Pq.encode(col("v"), model).as("c")).head().getLong(0)
      assert(got == 0L)
    }

    it("fails loudly on a vector/codebook dimension mismatch") {
      // silent zero-padding would diverge from the codebook-literal
      // oracle replay with no error (same contract as NearestCentroid)
      import spark.implicits._
      val model = Pq.PqModel(2, 2, Seq(
        Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
        Seq(Seq(0.0, 0.0), Seq(-1.0, -1.0))))
      val err = intercept[Exception] {
        Seq(Seq(0.9, 0.9, -0.9)).toDF("v") // 3 dims, codebooks cover 4
          .select(Pq.encode(col("v"), model).as("c")).collect()
      }
      val msgs = Iterator.iterate(err: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("3 dims, codebooks cover 4"), msgs)
    }

    it("ADC distance equals the table sum recomputed from the code") {
      import spark.implicits._
      val emb = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("features"))
      val model = Pq.fitCached("pqspec:adc", emb, dims = 64)
      val q = emb.filter(col("vec_id") === 7)
        .head().getSeq[Double](1).toSeq
      val table = Pq.adcTable(q, model)
      val rows = emb.filter(col("vec_id") < 50)
        .select(col("vec_id"), Pq.encode(col("features"), model).as("code"),
          Pq.adcDistance(Pq.encode(col("features"), model), table).as("adc"))
        .collect()
      rows.foreach { r =>
        val code = r.getLong(1)
        val expected = (0 until model.m)
          .map(j => table(j)(((code >> (4 * j)) & 15L).toInt)).sum
        assert(math.abs(r.getDouble(2) - expected) < 1e-9)
      }
    }

    it("ADC top-10 recalls a floor of the exact-L2 top-10 and beats random") {
      import spark.implicits._
      val emb = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("features"))
      val model = Pq.fitCached("pqspec:recall", emb, dims = 64)
      val all = emb.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val coded = emb
        .select(col("vec_id"), Pq.encode(col("features"), model).as("code"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      def l2(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var i = 0
        while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
        d
      }
      val queries = (0L until 20L)
      val recalls = queries.map { qid =>
        val qv = all(qid)
        val exact = all.toSeq.filter(_._1 != qid)
          .sortBy { case (id, v) => (l2(qv, v), id) }.take(10).map(_._1).toSet
        val table = Pq.adcTable(qv.toSeq, model)
        val approx = coded.filter(_._1 != qid)
          .map { case (id, code) =>
            val d = (0 until model.m)
              .map(j => table(j)(((code >> (4 * j)) & 15L).toInt)).sum
            (id, d)
          }
          .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        (exact & approx).size / 10.0
      }
      val mean = recalls.sum / recalls.length
      info(f"PQ ADC recall@10 over 20 queries: $mean%.3f")
      // deliberately hard near-orthogonal corpus; random top-10 would
      // recall ~10/499 ≈ 0.02
      assert(mean >= 0.15, f"ADC recall $mean%.3f below floor")
    }

    it("IVF-PQ composition (y7) returns a full ADC-ordered top-10") {
      val rows = graft.SparkEntry.queries("y7_ivfpq_ann")(
        spark, "/root/testdata/sf0.001").collect()
      assert(rows.length == 10)
      val ds = rows.map(_.getDouble(1))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      assert(rows.forall(_.getLong(0) != 0L)) // query vector excluded
    }
  }
}
