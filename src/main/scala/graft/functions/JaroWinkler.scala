package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression — the
  * entity-resolution scoring primitive Spark lacks (`levenshtein` is the
  * only built-in edit metric; record-linkage toolkits standardize on
  * Jaro-Winkler for short name fields because it rewards shared prefixes
  * and tolerates transpositions).
  *
  * Semantics follow the classic Winkler formulation (the one the DuckDB
  * oracle's `jaro_winkler_similarity` implements — validated pairwise on
  * 5 000 random strings during development):
  *  - Jaro: match window `max(|a|,|b|)/2 - 1` (floor, clamped ≥ 0),
  *    greedy left-to-right matching, transpositions `t = ⌊mismatches/2⌋`,
  *    `j = (m/|a| + m/|b| + (m-t)/m) / 3`;
  *  - either string empty → 0.0 (DuckDB's convention, NOT 1.0);
  *  - Winkler boost only when `j > 0.7`: `j + ℓ·0.1·(1-j)` with ℓ the
  *    common prefix capped at 4.
  *
  * The per-row kernel is a static method (the `levenshtein` pattern —
  * codegen emits one static call that JIT inlines; generating the
  * double-loop inline would bloat the generated class past the JIT
  * inlining budget for no gain). Operates on UTF-16 code units of the
  * decoded string; the harness fixtures are ASCII where this equals
  * code-point semantics.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + win)
      var j = math.max(0, i - win)
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val j = (md / l1 + md / l2 + (m - t).toDouble / m) / 3.0
    if (j <= 0.7) j
    else {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  /** Column-API entry point: `jaro_winkler(a, b)`. */
  def jaro_winkler(a: Column, b: Column): Column =
    CatalystBridge.column(
      JaroWinkler(CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** SQL-registry triple for [[GraftExtensions]] / manual registration. */
  val registryEntry: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "jaro_winkler",
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1)))
}
