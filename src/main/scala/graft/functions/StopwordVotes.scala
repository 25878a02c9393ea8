package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document language-ID signals in ONE UTF-8 byte sweep of a
  * normalized (lowercased, single-space) string:
  *
  *   struct(votes: array<long>, has_han: boolean)
  *
  * `votes(i)` counts tokens belonging to `stopwordSets(i)` (a token may
  * vote in several sets — 'la' is both Spanish and French); `has_han` is
  * true iff any codepoint lies in the CJK Unified Ideographs block
  * (U+4E00–U+9FFF), decoded inline from the 3-byte UTF-8 sequences.
  *
  * Replaces the explode + conditional-sum groupBy formulation
  * ([[graft.operators.TextOps.langIdAgg]], kept as the cross-checked
  * reference): language ID depends only on a document's own tokens, so —
  * like SimHash — it needs NO shuffle at all; this expression runs inside
  * the scan's WholeStageCodegen stage and the whole corpus pass is
  * shuffle-free. Null input → null struct (callers coalesce upstream).
  */
case class StopwordVotes(child: Expression, stopwordSets: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stopword_votes expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("votes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("has_han", BooleanType, nullable = false)))

  override def prettyName: String = "stopword_votes"

  @transient private lazy val setBytes: Array[Array[Array[Byte]]] =
    stopwordSets.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  private def matches(bytes: Array[Byte], start: Int, len: Int,
                      set: Array[Array[Byte]]): Boolean = {
    var s = 0
    while (s < set.length) {
      val sw = set(s)
      if (sw.length == len) {
        var j = 0
        while (j < len && bytes(start + j) == sw(j)) j += 1
        if (j == len) return true
      }
      s += 1
    }
    false
  }

  /** Row-local kernel shared by eval and codegen. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    val votes = new Array[Long](setBytes.length)
    var hasHan = false
    var tokStart = 0
    var i = 0
    while (i < len) {
      val b = bytes(i) & 0xFF
      if (b == ' ') {
        var s = 0
        while (s < setBytes.length) {
          if (matches(bytes, tokStart, i - tokStart, setBytes(s))) votes(s) += 1
          s += 1
        }
        tokStart = i + 1
      } else if (!hasHan && (b & 0xF0) == 0xE0 && i + 2 < len) {
        // 3-byte UTF-8 sequence: decode and test the CJK block inline
        val cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) hasHan = true
      }
      i += 1
    }
    var s = 0
    while (s < setBytes.length) {
      if (matches(bytes, tokStart, len - tokStart, setBytes(s))) votes(s) += 1
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(votes), hasHan))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("votesExpr", this, classOf[StopwordVotes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordVotes {
  /** Column-API entry point. */
  def stopwordVotes(text: Column, sets: Seq[Seq[String]]): Column =
    CatalystBridge.column(StopwordVotes(CatalystBridge.expression(text), sets))
}
