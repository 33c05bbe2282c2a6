package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: 64-bit SimHash (Charikar 2002) over an
  * array of pre-hashed tokens (array<bigint>) — per-bit ±1 majority
  * vote, bit set when the vote sum is positive.
  *
  * One fused loop (tokens × 64 bit tests, a single stack-local counter
  * array) replacing the interpreted HOF chain, which paid a lambda
  * dispatch and a fresh 64-long array allocation per token.
  * Bit-parity with the SQL reference (TextOps.simhashSqlOverHs) is
  * locked by FunctionsSpec — integer vote sums are order-independent,
  * so the fingerprints are identical by construction.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        long[] $counts = new long[64];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          for (int $b = 0; $b < 64; $b++) {
            $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counts[$b] > 0L) $out |= (1L << $b);
        }
        ${ev.value} = $out;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def simhash64(hs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hs)))
  }
}
