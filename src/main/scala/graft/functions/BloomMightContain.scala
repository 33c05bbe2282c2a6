package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst predicate: Bloom membership probe of a BIGINT key
  * against a pre-built [[BlockedBloom]] sketch.
  *
  * The sketch rides in the plan as a codegen reference object — it is
  * task-serialized ONCE per executor with the broadcast task binary
  * (plain `Serializable` long-array data), and the generated code is a
  * single virtual call per row inside whole-stage codegen; no per-row
  * deserialization, no UDF boundary. The blocked layout makes that call
  * ONE cache-line fetch, not k scattered DRAM reads — see
  * [[BlockedBloom]] for the measured motivation.
  *
  * Scale intent: a membership test against a small-but-not-broadcastable
  * key set (e.g. every distinct benchmark shingle) crosses a 100 TB
  * cluster as ~2 bytes/key of sketch instead of shuffling every
  * probe-side row into a join. False positives are bounded (~1e-3);
  * there are NO false negatives, so a bloom prefilter followed by an
  * exact confirm join is exact while only candidate rows (true hits +
  * fpp of the rest) reach the exchange.
  */
case class BloomMightContain(child: Expression, bloom: BlockedBloom)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BlockedBloom].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API wrapper (Spark 4 column-node bridge). */
  def mightContain(key: Column, bloom: BlockedBloom): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloom))
  }
}
