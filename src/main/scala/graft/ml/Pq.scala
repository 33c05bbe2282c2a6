package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Product quantization — the codebook side of the canonical IVF-PQ
  * index for billion-vector ANN (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  * literature). Beyond the reference's surface (its corpora fit in
  * memory); implemented as the 100 TB scale path next to IVF (y5) and
  * LSH (y4):
  *
  *  - **Fit**: the d-dim space splits into `m` subspaces of `dsub`
  *    dims; all m k-centroid codebooks train TOGETHER — each Lloyd
  *    iteration is one distributed encode+groupBy job (fit-once
  *    memoized like the IVF quantizer, deterministic diagonal init).
  *  - **Encode**: one codegen'd [[graft.functions.PqEncode]] pass packs
  *    each vector into m 4-bit codes in a single BIGINT — 16 bytes of
  *    float64 per dim become 4 bits per subspace (64× compression at
  *    the default 64-dim/8-subspace/16-centroid geometry).
  *  - **Search (ADC)**: a query precomputes the m×k table of
  *    query-subspace→centroid distances driver-side (tiny); the
  *    per-row approximate distance is m literal-array lookups summed —
  *    no vector arithmetic touches the corpus at query time.
  */
object Pq {

  /** `codebooks(j)(c)` = centroid c of subspace j (length dsub). */
  case class PqModel(m: Int, dsub: Int, codebooks: Seq[Seq[Seq[Double]]])

  private val modelCache = TrieMap.empty[String, PqModel]

  private[graft] def clearModelCacheForTest(): Unit = modelCache.clear()

  /** Fit-once per `key`: ALL m codebooks train together — one Lloyd
    * iteration is ONE distributed job (encode with the current
    * codebooks via the codegen'd expression, then a single groupBy
    * (subspace, code) computing per-dim sums), not m separate KMeans
    * fits each with their own job fan-out (measured: 8 sequential ML
    * fits cost ~9.6 s at sf0.1; this loop ~2 s). Init is the
    * per-subspace min→max diagonal — deterministic under any row order
    * or partitioning, no RNG state. Empty cells keep their previous
    * centroid. */
  def fitCached(key: String, df: DataFrame, dims: Int, m: Int = 8,
      k: Int = 16, maxIter: Int = 5,
      featuresCol: String = "features"): PqModel =
    modelCache.getOrElseUpdate(key, {
      require(dims % m == 0, s"pq: dims=$dims not divisible by m=$m")
      val dsub = dims / m
      val v = col(featuresCol)

      // one pass: per-dim min/max → diagonal init
      val mins = (0 until dims).map(i =>
        min(element_at(v, i + 1).cast("double")).as(s"mn$i"))
      val maxs = (0 until dims).map(i =>
        max(element_at(v, i + 1).cast("double")).as(s"mx$i"))
      val mm = df.agg((mins ++ maxs).head, (mins ++ maxs).tail: _*).head()
      val lo = (0 until dims).map(mm.getDouble)
      val hi = (0 until dims).map(i => mm.getDouble(dims + i))
      var model = PqModel(m, dsub, (0 until m).map { j =>
        (0 until k).map { c =>
          (0 until dsub).map { i =>
            val d = j * dsub + i
            lo(d) + (c + 0.5) / k * (hi(d) - lo(d))
          }
        }
      })

      var it = 0
      while (it < maxIter) {
        // (subspace, code) → count + per-dim sums, all subspaces in one
        // shuffle of m rows per input row, k·m groups total
        val sub = df
          .select(encode(v, model).as("__code"), v.as("__v"))
          .select(explode(array((0 until m).map(j => struct(
            lit(j).as("j"),
            shiftright(col("__code"), 4 * j).bitwiseAND(lit(15L)).as("c"),
            slice(col("__v"), j * dsub + 1, dsub).as("sv"))): _*)).as("e"))
          .select(col("e.j"), col("e.c"), col("e.sv"))
        val aggCols = count(lit(1)).as("n") +:
          (0 until dsub).map(i =>
            sum(element_at(col("sv"), i + 1).cast("double")).as(s"s$i"))
        val stats = sub.groupBy("j", "c")
          .agg(aggCols.head, aggCols.tail: _*)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1)) ->
            (r.getLong(2), (0 until dsub).map(i => r.getDouble(3 + i))))
          .toMap
        model = PqModel(m, dsub, (0 until m).map { j =>
          (0 until k).map { c =>
            stats.get((j, c.toLong)) match {
              case Some((n, sums)) if n > 0 => sums.map(_ / n)
              case _ => model.codebooks(j)(c)
            }
          }
        })
        it += 1
      }
      model
    })

  /** Packed PQ code column (one BIGINT per vector). */
  def encode(v: Column, model: PqModel): Column =
    graft.functions.PqEncode.pq_encode(v, model.codebooks)

  /** m×k asymmetric-distance table for one query vector: exact squared
    * distance of each query subspace to each centroid. Driver-side —
    * m·k·dsub multiplies on ONE vector. */
  def adcTable(query: Seq[Double], model: PqModel): Seq[Seq[Double]] =
    (0 until model.m).map { j =>
      (0 until model.codebooks(j).length).map { c =>
        var d = 0.0
        var i = 0
        while (i < model.dsub) {
          val x = (if (j * model.dsub + i < query.length)
            query(j * model.dsub + i) else 0.0) - model.codebooks(j)(c)(i)
          d += x * x
          i += 1
        }
        d
      }
    }

  /** Approximate squared distance of a packed-code column to the query
    * behind `table`: m literal-array lookups, fully codegen'd. */
  def adcDistance(code: Column, table: Seq[Seq[Double]]): Column =
    table.zipWithIndex.map { case (row, j) =>
      element_at(
        array(row.map(lit): _*),
        (shiftright(code, 4 * j).bitwiseAND(lit(15L)) + 1).cast("int"))
    }.reduce(_ + _)
}
