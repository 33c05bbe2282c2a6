package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, PolyHash64, RollingFingerprint,
  SimHash64, SpanHash}

/** SparkSessionExtensions entry point: installs the engine's native
  * functions into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` — the standard plug-in
  * path for clusters where sessions are built by the platform, not the
  * application (no per-session register() calls needed).
  *
  * Injected SQL surface (the expressions whose parameters are
  * SQL-expressible; LshSignBits / PqEncode carry plan-time literal
  * plane/codebook matrices and are constructed via their Column APIs):
  *   - `graft_cosine(array<float|double>, array<float|double>)`
  *   - `graft_polyhash64(string)` — portable 64-bit string hash
  *   - `graft_simhash64(array<bigint>)` — 64-bit SimHash fingerprint
  *   - `graft_fingerprint(string)` — Rabin–Karp code-point fingerprint
  *   - `graft_span_hash(array<bigint>, n)` — width-n Horner span hashes
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))

    inject("graft_cosine", classOf[CosineSimilarity],
      children => CosineSimilarity(children(0), children(1)))
    inject("graft_polyhash64", classOf[PolyHash64],
      children => PolyHash64(children.head))
    inject("graft_simhash64", classOf[SimHash64],
      children => SimHash64(children.head))
    inject("graft_fingerprint", classOf[RollingFingerprint],
      children => RollingFingerprint(children.head))
    inject("graft_span_hash", classOf[SpanHash], { children =>
      require(children.length == 2 && children(1).foldable,
        "graft_span_hash(token_hashes, n): n must be a literal integer")
      // a NULL or non-integral literal must fail analysis with a clear
      // message, not an NPE/ClassCastException from a blind cast
      val n = children(1).eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long if l >= 1 && l <= Int.MaxValue => l.intValue()
        case s: java.lang.Short => s.intValue()
        case b: java.lang.Byte => b.intValue()
        case bad => throw new IllegalArgumentException(
          "graft_span_hash(token_hashes, n): n must be a non-null integer " +
            s"literal, got ${if (bad == null) "NULL" else bad.toString}: " +
            children(1).dataType.simpleString)
      }
      SpanHash(children(0), n)
    })
  }
}
