package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: Bloom-filter membership probe of a BIGINT
  * key against a pre-built `spark-sketch` [[BloomFilter]].
  *
  * The sketch rides in the plan as a codegen reference object — it is
  * task-serialized ONCE per executor with the closure (BloomFilterImpl
  * is `Serializable`), and the generated code is a single virtual call
  * per row inside whole-stage codegen; no per-row deserialization, no
  * UDF boundary.
  *
  * Scale intent: a membership test against a small-but-not-tiny key set
  * (e.g. every distinct benchmark shingle) crosses a 100 TB cluster as
  * ~1.2 bytes/key of sketch instead of shuffling every probe-side row
  * into a join. False positives are bounded by the build-time `fpp`;
  * there are NO false negatives, so a bloom prefilter followed by an
  * exact confirm join is exact while only candidate rows (true hits +
  * fpp of the rest) reach the exchange.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def mightContain(key: Column, bloom: BloomFilter): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloom))
  }
}
