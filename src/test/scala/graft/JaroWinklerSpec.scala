package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler
import graft.functions.JaroWinkler.jaro_winkler

class JaroWinklerSpec extends SparkSuite {
  import spark.implicits._

  /** Textbook reference, written independently of the production kernel's
    * loop structure (tracks the DuckDB oracle's classic-Winkler semantics:
    * floor match window, greedy matching, ⌊mismatch/2⌋ transpositions,
    * boost only above 0.7, prefix capped at 4, empty → 0). */
  private def ref(s1: String, s2: String): Double = {
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val used = Array.fill(l2)(false)
    val matches1 = for {
      i <- 0 until l1
      j <- (math.max(0, i - win) to math.min(l2 - 1, i + win))
        .find(j => !used(j) && s1(i) == s2(j))
    } yield { used(j) = true; (i, j) }
    val m = matches1.length
    if (m == 0) return 0.0
    val inOrder = matches1.map(_._2).sorted.map(s2(_))
    val t = matches1.map(_._1).map(s1(_)).zip(inOrder).count(p => p._1 != p._2) / 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j <= 0.7) j
    else j + s1.zip(s2).take(4).takeWhile(p => p._1 == p._2).length * 0.1 * (1 - j)
  }

  test("known record-linkage values (the DuckDB oracle's answers)") {
    // expected values read off DuckDB's jaro_winkler_similarity during
    // development — the oracle contract this expression must hold
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("crate", "trace", 0.7333333333333334), // no common prefix → no boost
      ("abcdxxxxzz", "abcdyyyyqq", 0.6),      // jaro ≤ 0.7 → boost suppressed
      ("a", "a", 1.0),
      ("ab", "ba", 0.0),                      // window 0 → no matches
      ("abc", "", 0.0),                       // DuckDB: empty → 0, not 1
      ("", "", 0.0))
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(jaro_winkler($"a", $"b")).as[Double].collect()
    cases.zip(got).foreach { case ((a, b, want), v) =>
      assert(math.abs(v - want) < 1e-12, s"jw($a, $b) = $v, want $want")
    }
  }

  test("expression == independent reference on 2000 random strings") {
    val rnd = new scala.util.Random(7)
    def word() = (0 until rnd.nextInt(13)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val cases = (1 to 2000).map(_ => (word(), word()))
    val got = cases.toDF("a", "b").select(jaro_winkler($"a", $"b"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), v) =>
      assert(v == ref(a, b), s"jw($a, $b) = $v, ref ${ref(a, b)}")
    }
  }

  test("interpreted eval == codegen; null propagates; SQL name registered") {
    // static kernel is shared, so pin the three entry points agree
    val viaKernel = JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString("martha"),
      org.apache.spark.unsafe.types.UTF8String.fromString("marhta"))
    val viaSql = spark.sql("SELECT jaro_winkler('martha', 'marhta')")
      .as[Double].head()
    assert(viaKernel == viaSql)
    val withNull = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
    assert(withNull.select(jaro_winkler($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("symmetry and bounds on real part names") {
    val n = Tables.part(spark, SF).select($"p_name").distinct().limit(40)
    val rows = n.as("a").join(n.as("b"))
      .select(jaro_winkler($"a.p_name", $"b.p_name").as("ab"),
        jaro_winkler($"b.p_name", $"a.p_name").as("ba"),
        ($"a.p_name" === $"b.p_name").as("same"))
      .as[(Double, Double, Boolean)].collect()
    rows.foreach { case (ab, ba, same) =>
      assert(ab == ba, "jw must be symmetric")
      assert(ab >= 0.0 && ab <= 1.0)
      if (same) assert(ab == 1.0)
    }
  }
}
