package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: width-`n` Horner span hashes over a
  * pre-hashed token array (array<bigint>, values in [0, p)):
  *
  *   span(i) = fold(acc = (acc·B + ht[i+j]) mod p, j = 0..n−1)
  *
  * for every window start i, with the whole-list fold as the short-doc
  * (< n tokens) fallback — the hash image of [[graft.operators.TextOps
  * .shingles]]' whole-text fallback. One fused loop, one output array.
  *
  * Why native: the `transform(sequence(...), i -> fold over
  * element_at(ht, i+j))` formulation references `ht` n times inside a
  * lambda body; CollapseProject's multi-reference guard does not see
  * through lambda bodies, so the optimizer inlines the token-hash
  * transform into EVERY element_at — re-hashing all tokens n times per
  * span, interpreted (higher-order lambdas never enter codegen).
  * Measured: a single sf0.1 span-frame build task burned 12+ CPU-min
  * in that shape; this expression builds the same frame in well under
  * a second. Arithmetic is ANSI-safe by range: acc < p ≈ 2³⁰,
  * acc·B + h < 2⁵¹. DuckDB reproduces it exactly (list_reduce Horner
  * folds over list_slice windows — TextOps.spanHornerCtes).
  *
  * Input contract: token hashes are expected in [0, p) (PolyHash64
  * already reduces mod p). Because `graft_span_hash` is a PUBLIC SQL
  * function accepting any array<bigint>, inputs are defensively reduced
  * with floorMod(h, p) — a no-op (bit-identical output) for in-range
  * values, and it keeps the overflow-safety invariant instead of
  * silently overflowing on negative/large out-of-range hashes.
  */
case class SpanHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) {
      TypeCheckResult.TypeCheckFailure(s"span width must be >= 1, got $n")
    } else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"span_hash expects array<bigint> token hashes, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val ht = input.asInstanceOf[ArrayData]
    val len = ht.numElements()
    val nSpans = math.max(1, len - n + 1)
    val out = new Array[Long](nSpans)
    def h(k: Int): Long = java.lang.Math.floorMod(ht.getLong(k), SpanHash.P)
    if (len < n) {
      var acc = 0L
      var j = 0
      while (j < len) { acc = (acc * SpanHash.B + h(j)) % SpanHash.P; j += 1 }
      out(0) = acc
    } else {
      var i = 0
      while (i < nSpans) {
        var acc = 0L
        var j = 0
        while (j < n) { acc = (acc * SpanHash.B + h(i + j)) % SpanHash.P; j += 1 }
        out(i) = acc
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val nSpans = ctx.freshName("nSpans")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
        int $len = $a.numElements();
        int $nSpans = java.lang.Math.max(1, $len - ${n - 1});
        long[] $out = new long[$nSpans];
        if ($len < $n) {
          long $acc = 0L;
          for (int $j = 0; $j < $len; $j++) {
            $acc = ($acc * ${SpanHash.B}L +
              java.lang.Math.floorMod($a.getLong($j), ${SpanHash.P}L)) % ${SpanHash.P}L;
          }
          $out[0] = $acc;
        } else {
          for (int $i = 0; $i < $nSpans; $i++) {
            long $acc = 0L;
            for (int $j = 0; $j < $n; $j++) {
              $acc = ($acc * ${SpanHash.B}L +
                java.lang.Math.floorMod($a.getLong($i + $j), ${SpanHash.P}L)) % ${SpanHash.P}L;
            }
            $out[$i] = $acc;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanHash {
  /** Horner base (any value < P works; shared with the DuckDB oracle). */
  val B: Long = 1000003L
  /** MinHash prime p = 1e9 + 7 — token hashes are already mod p. */
  val P: Long = 1000000007L

  /** Reference implementation (specs). Mirrors the expression exactly,
    * including the defensive floorMod input reduction. */
  def spans(ht: Array[Long], n: Int): Array[Long] = {
    def step(a: Long, h: Long) = (a * B + java.lang.Math.floorMod(h, P)) % P
    if (ht.length < n) Array(ht.foldLeft(0L)(step))
    else ht.sliding(n).map(_.foldLeft(0L)(step)).toArray
  }

  /** Column API wrapper (Spark 4 column-node bridge). */
  def spanHash(ht: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SpanHash(ColumnBridge.expression(ht), n))
  }
}
