package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** n-word shingle formation as a native Catalyst expression: one pass over
  * the text per ROW, emitting `array<string>` of all contiguous n-token
  * windows (tokens = non-empty runs between single spaces, windows joined
  * by a single space).
  *
  * This is the scale-critical replacement for the window-`lead`
  * formulation ([[graft.operators.TextOps.shingles]]): that one explodes
  * every token and shuffles + sorts the WHOLE token stream by doc id just
  * to line up adjacent tokens — at 100 TB that is a full-corpus shuffle
  * before any hashing happens. Shingle adjacency is a property of a single
  * document, so it belongs in a row-local expression: this operator forms
  * all shingles inside the scan's WholeStageCodegen stage, and the only
  * shuffle left in a MinHash pipeline is the final per-doc min-aggregate
  * (map-side partial, one row per doc per partition).
  *
  * The higher-order-function formulation (`transform` over
  * `split(normalize(text))`) is NOT an alternative: Catalyst's
  * CollapseProject inlines the token-array expression into the lambda and
  * re-evaluates the normalize+split per element — O(tokens²) per document
  * (measured 102 s vs 2 s at sf0.1).
  *
  * Semantics (byte-identical to the window form and the DuckDB oracle's
  * `token || ' ' || lead(token,1) OVER w ...`):
  *   - null text → null array;
  *   - empty tokens (from leading/trailing/doubled separators) are dropped;
  *   - fewer than n tokens → empty array (doc then vanishes from any
  *     downstream explode+groupBy, same as the window form's null filter).
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingles expects a string input, got ${child.dataType.simpleString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"shingles expects n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles"

  /** Row-local kernel shared by eval and codegen. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    // Manual tokenizer (split on ' ', skip empties): no regex, no
    // intermediate String[] from String.split's pattern machinery.
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) != ' ') {
        val start = i
        while (i < len && s.charAt(i) != ' ') i += 1
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start
        tokEnds(nTok) = i
        nTok += 1
      } else i += 1
    }
    val m = nTok - n + 1
    if (m <= 0) Shingles.EMPTY
    else {
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(s, tokStarts(k + j), tokEnds(k + j))
          j += 1
        }
        out(k) = UTF8String.fromString(sb.toString)
        k += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference the expression instance and call the kernel — the loop body
    // is data-dependent, so a method call keeps the generated class small
    // while the surrounding operators stay inside WholeStageCodegen.
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Column-API entry point: `shingles(text, n)`. */
  def shingles(text: Column, n: Int): Column =
    CatalystBridge.column(Shingles(CatalystBridge.expression(text), n))

  /** SQL-registry triple for [[GraftExtensions]]: `shingles(text, n)` with a
    * foldable integer n. */
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "shingles",
    new ExpressionInfo(classOf[Shingles].getName, "shingles"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "shingles(text, n) expects a foldable integer n")
      Shingles(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
    })
}
