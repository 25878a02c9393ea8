package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` as a codegen'd predicate — the probe side
  * of a runtime join filter. The bloom sketch is built once from the join's
  * small side and baked into the plan (it rides the serialized expression
  * to every task, exactly like a broadcast variable's payload); each fact
  * row then pays ~k hash probes instead of a shuffle ride to a join it
  * would lose. False positives only ever KEEP a row (the exact join behind
  * the filter decides truth), so the filter is semantics-free by
  * construction. Null keys → false (a null never matches an equi-join). */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects an integral key, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  /** Row-local kernel shared by eval and codegen. */
  def compute(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long => compute(l)
    case i: java.lang.Integer => compute(i.toLong)
    case s: java.lang.Short => compute(s.toLong)
    case b: java.lang.Byte => compute(b.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def mightContain(key: Column, bloom: BloomFilter): Column =
    CatalystBridge.column(BloomMightContain(CatalystBridge.expression(key), bloom))
}
