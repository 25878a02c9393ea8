package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document text statistics over a NORMALIZED (lowercased,
  * single-space-separated, trimmed) string:
  *
  *   struct(n_chars, n_tokens, stop_hits, punct_chars)  — all LongType
  *
  * with semantics bit-identical to the composable-function formulation the
  * quality-score operator previously ran:
  *  - n_chars      = length(norm)                      (codepoints)
  *  - n_tokens     = size(split(norm, " "))            (spaces + 1 — the
  *                   empty string counts 1, matching split/string_split)
  *  - stop_hits    = count of tokens ∈ stopwords
  *  - punct_chars  = codepoints outside [a-z0-9 ]
  *
  * That formulation walks the string FOUR times (length, split+filter for
  * stopwords, regexp_replace for the punctuation class, split for tokens) —
  * each a separate allocation-heavy pass inside the scan stage; this
  * expression computes all four counters in one UTF-8 byte sweep with no
  * per-token allocation (token boundaries are byte offsets; a space byte
  * never occurs inside a multi-byte UTF-8 sequence, and any multi-byte
  * codepoint is by definition outside [a-z0-9 ]). Duplicate uses of the
  * expression in one projection are unified by codegen subexpression
  * elimination, so extracting all four struct fields still sweeps once.
  *
  * Stopwords are a compile-time argument (they parameterize the operator,
  * not the data). Null input → null struct.
  */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("punct_chars", LongType, nullable = false)))

  override def prettyName: String = "text_stats"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  private def isStopword(bytes: Array[Byte], start: Int, len: Int): Boolean = {
    var s = 0
    while (s < stopBytes.length) {
      val sw = stopBytes(s)
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
    var nChars = 0L
    var nTokens = 1L // split(norm, " ") on "" yields [""]: tokens = spaces + 1
    var stop = 0L
    var punct = 0L
    var tokStart = 0
    var i = 0
    while (i < len) {
      val b = bytes(i) & 0xFF
      if ((b & 0xC0) != 0x80) { // ASCII or a multi-byte lead: one codepoint
        nChars += 1
        if (b != ' ' && !(b >= 'a' && b <= 'z') && !(b >= '0' && b <= '9'))
          punct += 1
      }
      if (b == ' ') {
        nTokens += 1
        if (isStopword(bytes, tokStart, i - tokStart)) stop += 1
        tokStart = i + 1
      }
      i += 1
    }
    if (isStopword(bytes, tokStart, len - tokStart)) stop += 1
    new GenericInternalRow(Array[Any](nChars, nTokens, stop, punct))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsExpr", this, classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  /** Column-API entry point: `textStats(normalizedText, stopwords)`. */
  def textStats(text: Column, stopwords: Seq[String]): Column =
    CatalystBridge.column(TextStats(CatalystBridge.expression(text), stopwords))

  /** SQL-registry triple for [[GraftExtensions]]: stopwords as trailing
    * string-literal arguments — `text_stats(t, 'the', 'and', ...)`. */
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "text_stats",
    new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
    (exprs: Seq[Expression]) => {
      require(exprs.nonEmpty, "text_stats(text, stopwords...) expects arguments")
      val stops = exprs.tail.map { e =>
        require(e.foldable,
          s"text_stats: stopword arguments must be string literals, got ${e.sql}")
        val v = e.eval(InternalRow.empty)
        require(v != null && e.dataType == StringType,
          s"text_stats: stopword arguments must be non-null strings, got ${e.sql}")
        v.asInstanceOf[UTF8String].toString
      }
      TextStats(exprs.head, stops)
    })
}
