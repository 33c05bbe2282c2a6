package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: portable 64-bit polynomial string hash.
  *
  *   h = (fold(acc = acc·M + codepoint, acc₀ = M) · M)  mod 2⁶⁴
  *
  * with M = 6364136223846793005 (the 64-bit LCG multiplier). The
  * trailing multiply diffuses a last-character difference across the
  * high bits, so SimHash majority votes and LSH band equality behave
  * like they do with a general-purpose hash.
  *
  * Why not xxhash64: the whole point is engine portability. The fold is
  * plain integer arithmetic over Unicode codepoints, so DuckDB can
  * reproduce it bit-exactly with HUGEINT modular arithmetic
  * (list_reduce over string_split(s, '') / unicode(c), mod 2⁶⁴, then a
  * signed-BIGINT cast) — which is what upgrades the MinHash and SimHash
  * dedup queries from rows-only checks to full hash-compare oracles.
  * Java long arithmetic wraps mod 2⁶⁴ natively, so Spark-side cost is
  * one fused loop per string — same shape as xxhash64.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"polyhash64 expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val idx = ctx.freshName("idx")
      val cp = ctx.freshName("cp")
      s"""
        java.lang.String $str = $s.toString();
        long $acc = ${PolyHash64.M}L;
        int $idx = 0;
        while ($idx < $str.length()) {
          int $cp = $str.codePointAt($idx);
          $idx += java.lang.Character.charCount($cp);
          $acc = $acc * ${PolyHash64.M}L + (long) $cp;
        }
        ${ev.value} = $acc * ${PolyHash64.M}L;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash64 {
  /** 64-bit LCG multiplier (Knuth MMIX). */
  val M: Long = 6364136223846793005L

  /** Reference implementation (used by eval and specs). */
  def hash(s: String): Long = {
    var acc = M
    var idx = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      idx += Character.charCount(cp)
      acc = acc * M + cp
    }
    acc * M
  }

  /** Column API wrapper (Spark 4 column-node bridge). */
  def polyhash64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PolyHash64(ColumnBridge.expression(c)))
  }
}
