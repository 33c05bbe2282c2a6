package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization code of a numeric
  * vector, packed into one BIGINT.
  *
  * The vector is split into `m` contiguous subspaces of `dsub` dims;
  * each subspace is assigned its nearest codebook centroid (squared
  * euclidean, sequential accumulation, ties → lowest centroid index)
  * and the m 4-bit codes pack little-endian into a long (k ≤ 16,
  * m ≤ 16). Codebooks are PLAN-TIME CONSTANTS shipped inside the
  * serialized expression — encoding costs m·k·dsub fused
  * multiply-adds inside whole-stage codegen, the same
  * literals-not-hashes discipline as [[LshSignBits]].
  *
  * `codebooks(j)(c)` is centroid c of subspace j, length `dsub`.
  */
case class PqEncode(child: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  private def m: Int = codebooks.length
  private def k: Int = codebooks.head.length
  private def dsub: Int = codebooks.head.head.length

  require(m >= 1 && m <= 16, s"pq_encode: m must be in [1,16], got $m")
  require(k >= 1 && k <= 16, s"pq_encode: k must be in [1,16], got $k")
  require(codebooks.forall(cb => cb.length == k &&
      cb.forall(_.length == dsub)),
    "pq_encode: ragged codebooks")

  // flat layout: centroid (j, c) dim i at [(j*k + c)*dsub + i]
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * k * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var i = 0
        while (i < dsub) {
          out((j * k + c) * dsub + i) = codebooks(j)(c)(i)
          i += 1
        }
        c += 1
      }
      j += 1
    }
    out
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** A vector whose length differs from m·dsub silently zero-padded /
    * truncated would diverge from the codebook-literal oracle replay
    * with no error — fail loudly (same contract as NearestCentroid).
    * Public: invoked from generated code via addReferenceObj. */
  def dimError(n: Int): String =
    s"pq_encode: input vector has $n dims, codebooks cover ${m * dsub}"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != m * dsub) throw new IllegalArgumentException(dimError(n))
    var code = 0L
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d = 0.0
        val off = (j * k + c) * dsub
        var i = 0
        while (i < dsub) {
          val idx = j * dsub + i
          val x = if (isFloat) arr.getFloat(idx).toDouble else arr.getDouble(idx)
          val diff = x - flat(off + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code |= best.toLong << (4 * j)
      j += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    val selfRef = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncode].getName)
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val code = ctx.freshName("code")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off")
      val idx = ctx.freshName("idx")
      val diff = ctx.freshName("diff")
      s"""
        int $n = $a.numElements();
        if ($n != ${m * dsub}) {
          throw new IllegalArgumentException($selfRef.dimError($n));
        }
        long $code = 0L;
        for (int $j = 0; $j < $m; $j++) {
          int $best = 0;
          double $bestD = Double.POSITIVE_INFINITY;
          for (int $c = 0; $c < $k; $c++) {
            double $d = 0.0;
            int $off = ($j * $k + $c) * $dsub;
            for (int $i = 0; $i < $dsub; $i++) {
              int $idx = $j * $dsub + $i;
              double $diff = (double) $a.$getter($idx) - $cbRef[$off + $i];
              $d += $diff * $diff;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $code |= ((long) $best) << (4 * $j);
        }
        ${ev.value} = $code;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def pq_encode(v: org.apache.spark.sql.Column,
      codebooks: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebooks))
  }
}
