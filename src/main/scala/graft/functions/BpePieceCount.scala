package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the x12 BPE-ish piece count — the number
  * of matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — computed as one
  * byte-classification pass, no regex engine, no match-array
  * materialization.
  *
  * Why native: `size(regexp_extract_all(text, ...))` walks the string
  * through `java.util.regex` AND allocates one UTF8String per matched
  * piece plus the array holding them, only to take the array's LENGTH.
  * At the ×10000 blow-up (50 M docs) that formulation is the honest
  * table's per-row dominator — 1 598 s cold / 27 min per pass
  * (BENCH_SCALES §fourth decade). The count is a pure left-to-right
  * classification: pieces are exactly (a) maximal runs of ASCII
  * letters, (b) maximal runs of ASCII digits, (c) every other
  * non-whitespace CODE POINT individually — the alternation is
  * leftmost-greedy, so `[A-Za-z]+` always swallows a whole letter run
  * and the single-char class picks up everything else one code point
  * at a time.
  *
  * Byte-level contract (UTF8String guarantees well-formed UTF-8):
  * continuation bytes (0b10xxxxxx) belong to an already-counted code
  * point and are skipped, so a supplementary-plane character counts
  * ONE piece — matching java.util.regex, which matches `[^...]` per
  * code point, and RE2/DuckDB likewise. Whitespace is the regex's
  * ASCII `\s` = [ \t\n\x0B\f\r] (java.util.regex without UNICODE_
  * CHARACTER_CLASS; RE2's \s differs only by \x0B, which no tokenized
  * corpus contains — the same Java-vs-RE2 envelope the regex
  * formulation itself relied on to pass the DuckDB oracle).
  * FunctionsSpec pins bit-parity against `size(regexp_extract_all)`
  * on the corpus and on adversarial edge inputs, and a ScalaCheck
  * property fuzzes arbitrary UTF-8 (incl. supplementary planes and
  * control bytes) against the regex formulation.
  *
  * MALFORMED-UTF-8 caveat (ADVICE r12): the parity contract assumes
  * well-formed UTF-8 — `UTF8String` carries raw bytes, and a stray
  * continuation byte (0x80–0xBF with no leading byte) is SKIPPED here,
  * while any path that first decodes to java.lang.String would see
  * U+FFFD per stray byte and count it as a piece. Corrupt (non-UTF-8)
  * parquet data can therefore diverge from a decode-first engine.
  * This is the documented envelope, not a bug: the regex formulation
  * this expression replaced read the same UTF8String bytes through
  * Spark's own regex path (which decodes lazily per code point and has
  * its own undefined behavior on malformed bytes), and the DuckDB
  * oracle rejects invalid UTF-8 at ingest — so no oracle-checkable
  * input can reach the divergent case.
  */
case class BpePieceCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_pieces expects a string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    BpePieceCount.count(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpePieceCount.count($s.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpePieceCount {

  // piece-state classes for the run tracking
  private final val NoRun = 0
  private final val Letter = 1
  private final val Digit = 2

  /** One pass over the UTF-8 bytes. `state` tracks whether the previous
    * code point extended a letter/digit run; every "other" code point
    * is its own piece and resets the run (a letter after a symbol
    * starts a new `[A-Za-z]+` match, exactly as the regex scans). */
  def count(b: Array[Byte]): Int = {
    var n = 0
    var state = NoRun
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xFF
      if (x >= 0x80 && x < 0xC0) {
        // continuation byte: same code point as the leading byte
        i += 1
      } else if ((x >= 'A' && x <= 'Z') || (x >= 'a' && x <= 'z')) {
        if (state != Letter) n += 1
        state = Letter; i += 1
      } else if (x >= '0' && x <= '9') {
        if (state != Digit) n += 1
        state = Digit; i += 1
      } else if (x == ' ' || x == '\t' || x == '\n' || x == 0x0B ||
          x == '\f' || x == '\r') {
        state = NoRun; i += 1
      } else {
        // ASCII symbol or a non-ASCII leading byte: one piece per
        // code point
        n += 1; state = NoRun; i += 1
      }
    }
    n
  }

  /** Column API wrapper (Spark 4 column-node bridge). */
  def pieces(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpePieceCount(ColumnBridge.expression(c)))
  }
}
