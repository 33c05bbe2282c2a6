package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: two-level (coarse → sub) nearest-centroid
  * cell assignment — the k ∝ n quantizer kernel that lifts the flat
  * [[NearestCentroid]] past its k ceiling.
  *
  * Stage 1 scans the k1 coarse centroids; stage 2 scans ONLY the chosen
  * coarse cell's k2-row block of the sub matrix (coarse-major layout:
  * sub cell (c1, c2) at flat row c1·k2 + c2). Result is the GLOBAL sub
  * cell id `c1·k2 + c2`. Per-vector cost is (k1 + k2)·d — for a total
  * of k = k1·k2 cells that is 2√k·d when k1 ≈ k2 ≈ √k, vs the flat
  * argmin's k·d: at k = 65 536 (n ≈ 16.8 M at 256 members/cell) the
  * two-level assign is ~128× cheaper per vector, which is what makes
  * an UNCAPPED k ≈ n/256 dedup quantizer affordable (VERDICT r12 ask
  * #1; the flat expression pinned k at 4096 for exactly this cost
  * reason — NearestCentroid scaladoc, SCALE.md §SemDeDup).
  *
  * Both stages are the same kernel as [[NearestCentroid]]: squared
  * euclidean, sequential per-dimension double accumulation, ties →
  * lowest index — so a two-level assignment with k1 = 1 degenerates to
  * the flat assignment over the sub block bit-for-bit (QuantizerSpec
  * pins this), and the DuckDB replay of either stage is the same
  * list_sum/argmin CTE the y5/y8 oracles already use.
  *
  * Matrices ship via addReferenceObj (no literal tree in the plan), so
  * the plan stays O(1) width at any k; at k in the millions (n ~ 10⁹)
  * the flat sub matrix is k·d doubles — hundreds of MB — which is
  * broadcast-shipped once per executor exactly like any other
  * reference object, the standard FAISS-style "centroid table in RAM"
  * envelope (SCALE.md §SemDeDup documents the numbers).
  */
case class TwoLevelNearestCell(child: Expression,
    coarse: Seq[Seq[Double]], sub: Seq[Seq[Double]]) extends UnaryExpression {

  private def k1: Int = coarse.length
  private def d: Int = coarse.head.length
  private def k2: Int = sub.length / k1

  require(k1 >= 1, "two_level_cell: empty coarse matrix")
  require(sub.nonEmpty && sub.length % k1 == 0,
    s"two_level_cell: sub matrix rows ${sub.length} not a multiple of k1=$k1")
  require(coarse.forall(_.length == d) && sub.forall(_.length == d),
    "two_level_cell: ragged matrix")

  @transient private lazy val coarseFlat: Array[Double] = {
    val out = new Array[Double](k1 * d)
    var c = 0
    while (c < k1) {
      var i = 0
      while (i < d) { out(c * d + i) = coarse(c)(i); i += 1 }
      c += 1
    }
    out
  }

  @transient private lazy val subFlat: Array[Double] = {
    val out = new Array[Double](k1 * k2 * d)
    var c = 0
    while (c < k1 * k2) {
      var i = 0
      while (i < d) { out(c * d + i) = sub(c)(i); i += 1 }
      c += 1
    }
    out
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"two_level_cell expects array<float|double>, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // public: invoked from generated code via addReferenceObj
  def dimError(n: Int): String =
    s"two_level_cell: input vector has $n dims, centroids have $d"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != d) throw new IllegalArgumentException(dimError(n))
    def argmin(flat: Array[Double], from: Int, count: Int): Int = {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < count) {
        var dist = 0.0
        val off = (from + c) * d
        var i = 0
        while (i < d) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          val diff = x - flat(off + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      best
    }
    val c1 = argmin(coarseFlat, 0, k1)
    val c2 = argmin(subFlat, c1 * k2, k2)
    c1.toLong * k2 + c2
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val coRef = ctx.addReferenceObj("coarseCents", coarseFlat, "double[]")
    val suRef = ctx.addReferenceObj("subCents", subFlat, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val selfRef = ctx.addReferenceObj("twoLevelCell", this,
      classOf[TwoLevelNearestCell].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val b1 = ctx.freshName("b1")
      val b2 = ctx.freshName("b2")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dist = ctx.freshName("dist")
      val off = ctx.freshName("off")
      val diff = ctx.freshName("diff")
      s"""
        int $n = $a.numElements();
        if ($n != $d) {
          throw new IllegalArgumentException($selfRef.dimError($n));
        }
        int $b1 = 0;
        double $bestD = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $k1; $c++) {
          double $dist = 0.0;
          int $off = $c * $d;
          for (int $i = 0; $i < $d; $i++) {
            double $diff = (double) $a.$getter($i) - $coRef[$off + $i];
            $dist += $diff * $diff;
          }
          if ($dist < $bestD) { $bestD = $dist; $b1 = $c; }
        }
        int $b2 = 0;
        $bestD = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $k2; $c++) {
          double $dist = 0.0;
          int $off = ($b1 * $k2 + $c) * $d;
          for (int $i = 0; $i < $d; $i++) {
            double $diff = (double) $a.$getter($i) - $suRef[$off + $i];
            $dist += $diff * $diff;
          }
          if ($dist < $bestD) { $bestD = $dist; $b2 = $c; }
        }
        ${ev.value} = (long) $b1 * $k2 + $b2;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TwoLevelNearestCell {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def two_level_cell(v: org.apache.spark.sql.Column,
      coarse: Seq[Seq[Double]],
      sub: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      TwoLevelNearestCell(ColumnBridge.expression(v), coarse, sub))
  }
}
