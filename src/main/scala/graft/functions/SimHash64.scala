package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** SimHash-64 of a (normalized, single-space-separated) text column as a
  * native row-local expression: per token h = xxhash64(token) (Spark's
  * default seed 42 — bit-identical to the `xxhash64` SQL function on the
  * same token), per bit b a ±1 vote over tokens, bit set iff the vote sum
  * is positive. Returns 0 for a tokenless string, null for null input.
  *
  * SimHash is a function of one document's own tokens, so it does NOT need
  * the explode + 64-conditional-sum groupBy formulation
  * ([[graft.operators.TextOps.simhash64Agg]] — kept as the cross-checked
  * reference): that shape shuffles the whole token stream and carries 64
  * aggregation buffers per document. This expression runs inside the scan's
  * WholeStageCodegen stage — the near-dup pipeline's only shuffle is then
  * the LSH block groupBy. Tokens are hashed directly over the string's
  * UTF-8 byte ranges (a space byte never occurs inside a multi-byte UTF-8
  * sequence) — no per-token allocation.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  /** Row-local kernel shared by eval and codegen. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes // may copy once per row; tokens never do
    val len = bytes.length
    val votes = new Array[Int](64)
    var i = 0
    while (i < len) {
      if (bytes(i) != ' ') {
        val start = i
        while (i < len && bytes(i) != ' ') i += 1
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      } else i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) acc |= (1L << b)
      b += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point: `simhash64(normalizedText)`. */
  def simhash64(text: Column): Column =
    CatalystBridge.column(SimHash64(CatalystBridge.expression(text)))

  /** SQL-registry triple for [[GraftExtensions]]. */
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "simhash64",
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "simhash64(text) expects one argument")
      SimHash64(exprs.head)
    })
}
