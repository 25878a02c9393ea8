package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/** Order-preserving double→long bit transform:
  * `t = bits(v) XOR ((bits(v) >> 63) & 0x7fffffffffffffffL)` — ascending
  * double order equals ascending SIGNED long order on the result (the
  * IEEE-754 trick: positive doubles already sort as positive longs;
  * negative doubles get their magnitude bits flipped so their reversed
  * unsigned order becomes the correct signed order).
  *
  * This makes any fixed right-shift of the result a monotone, data-
  * independent value bucketing — the primitive that lets a distributed
  * rank ([[graft.operators.Ops.exactPercentiles]]) bucket values WITHOUT a
  * prior min/max pass over the data. Codegen'd: two branch-free long ops.
  */
case class OrderedBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ordered_bits expects a double input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "ordered_bits"

  @inline final def compute(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // fresh name: two ordered_bits in one codegen stage must not collide
      val b = ctx.freshName("bits")
      s"""
      long $b = Double.doubleToLongBits($c);
      ${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OrderedBits {
  /** Column-API entry point. */
  def orderedBits(v: Column): Column =
    CatalystBridge.column(OrderedBits(CatalystBridge.expression(v)))
}
