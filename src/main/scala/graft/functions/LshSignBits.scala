package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: random-hyperplane LSH sign-bit bucket id
  * of a numeric array column.
  *
  * The hyperplane matrix is a PLAN-TIME CONSTANT — computed once on the
  * driver (SimilarityOps.planeMatrix) and shipped inside the serialized
  * expression — so one bucket id costs nBits×dims fused multiply-adds
  * inside whole-stage codegen. The previous formulation re-derived every
  * plane component per ROW with xxhash64 expression chains (~1,800 hash
  * calls/row at 8 bits × 4 tables), which dominated the ANN queries.
  *
  * Bit-parity with the HOF reference (SimilarityOps.lshBucket) is locked
  * by FunctionsSpec: identical sequential double accumulation order,
  * identical `dot >= 0` sign rule, identical bit packing — so recall
  * numbers (AnnRecallSpec) are unchanged by construction.
  */
case class LshSignBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  private def nBits: Int = planes.length
  private def dims: Int = planes.head.length

  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](nBits * dims)
    var b = 0
    while (b < nBits) {
      val row = planes(b)
      var i = 0
      while (i < dims) { out(b * dims + i) = row(i); i += 1 }
      b += 1
    }
    out
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // Only the element types the eval/codegen getters handle; notably NOT
    // DecimalType, which would otherwise fall through to getByte and
    // produce silently wrong bucket ids.
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
        ShortType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_bits expects array<float|double|int|long|short|byte>, got $t")
  }

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val t = elemType
    val n = math.min(dims, arr.numElements())
    val get: Int => Double = t match {
      case FloatType => i => arr.getFloat(i).toDouble
      case DoubleType => i => arr.getDouble(i)
      case IntegerType => i => arr.getInt(i).toDouble
      case LongType => i => arr.getLong(i).toDouble
      case ShortType => i => arr.getShort(i).toDouble
      case _ => i => arr.getByte(i).toDouble
    }
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      val off = b * dims
      var i = 0
      while (i < n) { dot += get(i) * flat(off + i); i += 1 }
      if (dot >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  private def getter(arr: String, idx: String): String = elemType match {
    case FloatType => s"(double) $arr.getFloat($idx)"
    case DoubleType => s"$arr.getDouble($idx)"
    case IntegerType => s"(double) $arr.getInt($idx)"
    case LongType => s"(double) $arr.getLong($idx)"
    case ShortType => s"(double) $arr.getShort($idx)"
    case _ => s"(double) $arr.getByte($idx)"
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
        int $n = java.lang.Math.min($dims, $a.numElements());
        long $bucket = 0L;
        for (int $b = 0; $b < $nBits; $b++) {
          double $dot = 0.0;
          int $off = $b * $dims;
          for (int $i = 0; $i < $n; $i++) {
            $dot += (${getter(a, i)}) * $planesRef[$off + $i];
          }
          if ($dot >= 0.0) $bucket |= (1L << $b);
        }
        ${ev.value} = $bucket;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignBits {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def lsh_sign_bits(v: org.apache.spark.sql.Column,
      planes: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(LshSignBits(ColumnBridge.expression(v), planes))
  }
}
