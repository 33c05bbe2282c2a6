package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: index of the nearest centroid (squared
  * euclidean, sequential accumulation, ties → lowest index) among a
  * PLAN-TIME literal centroid matrix — the IVF cell-assignment kernel.
  *
  * Why native: the HOF formulation (`transform(literal-matrix, c ->
  * aggregate(zip_with(v, c, ...)))`) is semantically identical but
  * higher-order lambdas never enter whole-stage codegen — measured 2.6 s
  * vs 0.7 s for y5 at sf0.1. This is one fused k·d multiply-add loop,
  * centroids shipped via addReferenceObj (no literal tree in the plan —
  * √n cells stay viable at any corpus size), same discipline as
  * [[PqEncode]] (which is this expression specialized to 16 centroids
  * per subspace + bit packing).
  *
  * The sequential per-centroid fold is bit-identical to DuckDB's
  * `list_sum(list_transform(...))` replay, and first-min tie-breaking
  * matches `list_position(dl, list_min(dl))` — what keeps the y5/y7
  * oracles exact.
  */
case class NearestCentroid(child: Expression,
    cents: Seq[Seq[Double]]) extends UnaryExpression {

  private def k: Int = cents.length
  private def d: Int = cents.head.length

  require(k >= 1, "nearest_centroid: empty centroid matrix")
  require(cents.forall(_.length == d), "nearest_centroid: ragged matrix")

  // flat layout: centroid c dim i at [c*d + i]
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](k * d)
    var c = 0
    while (c < k) {
      var i = 0
      while (i < d) { out(c * d + i) = cents(c)(i); i += 1 }
      c += 1
    }
    out
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** A vector whose length differs from the centroid dimension is a
    * caller bug (mixed embedding tables, truncated parquet): silently
    * zero-padding/truncating would diverge from the literal-replay
    * oracle with no error — fail loudly instead (ADVICE r6). */
  // public: invoked from generated code via addReferenceObj
  def dimError(n: Int): String =
    s"nearest_centroid: input vector has $n dims, centroids have $d"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != d) throw new IllegalArgumentException(dimError(n))
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var dist = 0.0
      val off = c * d
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
    best.toLong
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val selfRef = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
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
        int $best = 0;
        double $bestD = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $k; $c++) {
          double $dist = 0.0;
          int $off = $c * $d;
          for (int $i = 0; $i < $d; $i++) {
            double $diff = (double) $a.$getter($i) - $cRef[$off + $i];
            $dist += $diff * $diff;
          }
          if ($dist < $bestD) { $bestD = $dist; $best = $c; }
        }
        ${ev.value} = (long) $best;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def nearest_centroid(v: org.apache.spark.sql.Column,
      cents: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), cents))
  }
}
