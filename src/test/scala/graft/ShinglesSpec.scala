package graft

import org.apache.spark.sql.functions._

import graft.functions.Shingles
import graft.operators.{Ops, TextOps}

/** The native [[Shingles]] expression: edge cases, codegen/interpreted
  * agreement, byte-parity with the window-`lead` formulation it replaces,
  * and SQL registration. */
class ShinglesSpec extends SparkSuite {
  import spark.implicits._

  private def sh(text: String, n: Int): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(Shingles.shingles($"t", n).as("s"))
      .as[Seq[String]].collect().head

  test("basic n-grams, n=1 identity, short/empty/null inputs") {
    assert(sh("a b c d", 3) == Seq("a b c", "b c d"))
    assert(sh("a b c d", 1) == Seq("a", "b", "c", "d"))
    assert(sh("a b", 3) == Seq.empty)
    assert(sh("", 2) == Seq.empty)
    val nul = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(Shingles.shingles($"t", 2).as("s")).collect().head
    assert(nul.isNullAt(0))
  }

  test("empty tokens from doubled/leading/trailing separators are dropped") {
    assert(sh("  a  b   c ", 2) == Seq("a b", "b c"))
  }

  test("interpreted eval agrees with codegen") {
    val e = Shingles(
      org.apache.spark.sql.catalyst.expressions.Literal("w x y z"), 2)
    val arr = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.toSeq[org.apache.spark.unsafe.types.UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString)
      == Seq("w x", "x y", "y z"))
  }

  test("byte-parity with the window-lead formulation on realistic docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = TextOps.explodedShingles(docs, "doc_id", "text", 3)
    val toks = TextOps.tokenize(docs, Ops.normalizeText($"text"), Seq($"doc_id"))
    val windowed = TextOps.shingles(toks, "doc_id", 3)
      .select($"doc_id", $"shingle")
    // multiset equality via per-key counts
    def counted(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("doc_id", "shingle").count()
        .as[(Long, String, Long)].collect().toSet
    assert(counted(native) == counted(windowed))
    assert(native.count() > 0)
  }

  test("registered as a SQL function via GraftExtensions") {
    val out = spark.sql("SELECT shingles('p q r s', 3) AS s")
      .as[Seq[String]].collect().head
    assert(out == Seq("p q r", "q r s"))
  }
}
