package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between a vector column
  * and row `cell` of a PLAN-TIME centroid matrix — the "cosine to own
  * centroid" kernel of the scaled SemDeDup path.
  *
  * Why it exists: [[graft.operators.SimilarityOps.semDedupRanked]]
  * computes ccos as `fastCosine(v, element_at(literal-2d-array, cell))`,
  * which builds a k·d literal expression tree in the plan — fine at the
  * driver scales' k ≤ tens, a plan-width explosion at the scaled path's
  * k ∝ n (hundreds of thousands of Literal nodes at k in the
  * thousands). Here the matrix ships via addReferenceObj like
  * [[NearestCentroid]]'s, the plan stays O(1) width, and the loop is the
  * EXACT [[CosineSimilarity]] accumulation (one pass, dot/na/nb in
  * double, `dot / (sqrt(na) * sqrt(nb))`) so values are bit-identical to
  * `fastCosine` against the same centroid (QuantizerSpec pins this) and
  * to the DuckDB `list_sum` replay the y8 oracle uses.
  */
case class CentroidCosine(left: Expression, right: Expression,
    cents: Seq[Seq[Double]]) extends BinaryExpression {

  private def k: Int = cents.length
  private def d: Int = cents.head.length

  require(k >= 1, "centroid_cosine: empty centroid matrix")
  require(cents.forall(_.length == d), "centroid_cosine: ragged matrix")

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

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"centroid_cosine expects (array<float|double>, bigint), got ($l, $r)")
    }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // public: invoked from generated code via addReferenceObj
  def cellError(c: Long): String =
    s"centroid_cosine: cell $c out of range [0, $k)"
  def dimError(n: Int): String =
    s"centroid_cosine: input vector has $n dims, centroids have $d"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val cell = r.asInstanceOf[Long]
    if (cell < 0 || cell >= k) throw new IllegalArgumentException(cellError(cell))
    val n = arr.numElements()
    if (n != d) throw new IllegalArgumentException(dimError(n))
    val off = cell.toInt * d
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val y = flat(off + i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val selfRef = ctx.addReferenceObj("centroidCosine", this,
      classOf[CentroidCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, cell) => {
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        if ($cell < 0 || $cell >= $k) {
          throw new IllegalArgumentException($selfRef.cellError($cell));
        }
        int $n = $a.numElements();
        if ($n != $d) {
          throw new IllegalArgumentException($selfRef.dimError($n));
        }
        int $off = (int) $cell * $d;
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $a.$getter($i);
          double y = $cRef[$off + $i];
          $dot += x * y; $na += x * x; $nb += y * y;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CentroidCosine {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def centroid_cosine(v: org.apache.spark.sql.Column,
      cell: org.apache.spark.sql.Column,
      cents: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CentroidCosine(
      ColumnBridge.expression(v), ColumnBridge.expression(cell), cents))
  }
}
