package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.{OrderedBits, Shingles, SimHash64}
import graft.operators.{Ops, TextOps}

/** ScalaCheck properties for the native Catalyst expressions — each is
  * checked against an independent reference implementation (plain Scala or
  * the built-in-operator formulation it replaced). Kept to few cases per
  * property: several run real Spark jobs. */
object FunctionProps extends Properties("functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = Sessions.local("4")
  import spark.implicits._

  // ---- OrderedBits: pure kernel, no Spark jobs needed -------------------

  private val anyDouble: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e12, 1e12),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, 1e-300, -1e-300),
  )

  private def ob(v: Double): Long =
    OrderedBits(org.apache.spark.sql.catalyst.expressions.Literal(v))
      .compute(v)

  property("OrderedBits is strictly monotone over doubles") =
    Prop.forAll(anyDouble, anyDouble) { (a, b) =>
      if (a < b) ob(a) < ob(b)
      else if (a > b) ob(a) > ob(b)
      else ob(a) == ob(b) || (a == 0.0 && b == 0.0) // ±0.0 differ in bits only
    }

  // ---- Shingles vs a plain-Scala reference ------------------------------

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "bb", "ccc", " ", "  ", "δδ", "x"))
      .map(_.mkString)

  private def refShingles(s: String, n: Int): Seq[String] = {
    val toks = s.split(" ").filter(_.nonEmpty).toSeq
    if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
  }

  property("Shingles equals the sliding-window reference on arbitrary text") =
    Prop.forAll(Gen.listOfN(8, textGen), Gen.choose(1, 4)) { (texts, n) =>
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select($"id", Shingles.shingles($"t", n).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      texts.zipWithIndex.forall { case (t, i) => got(i.toLong) == refShingles(t, n) }
    }

  // ---- SimHash64 native vs the aggregate formulation --------------------

  property("SimHash64 equals the explode+aggregate formulation") =
    Prop.forAll(Gen.listOfN(6, textGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = TextOps.simhash64(docs, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      val agg = TextOps.simhash64Agg(docs, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      native == agg
    }

  // ---- TextStats single-pass vs the 4-pass HOF formulation --------------

  private val statsTextGen: Gen[String] =
    Gen.listOf(Gen.oneOf("the", "and", "of", "word", "a1", "δδ", "汉字", "!?", ".", " ", "  ", ""))
      .map(_.mkString(" "))

  property("TextStats quality metrics equal the regex/split formulation") =
    Prop.forAll(Gen.listOfN(6, statsTextGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val stops = Seq("the", "and", "of", "to", "a", "is")
      val native = TextOps.qualityScore(docs, "doc_id", "text", stops)
        .orderBy("doc_id").collect().toSeq
      val hof = TextOps.qualityScoreHof(docs, "doc_id", "text", stops)
        .orderBy("doc_id").collect().toSeq
      native == hof
    }

  // ---- StopwordVotes single-sweep vs the explode+aggregate formulation --

  private val langTextGen: Gen[String] =
    Gen.listOf(Gen.oneOf("the", "and", "der", "und", "la", "les", "el", "y",
      "word", "汉", "字引", "x", "", " "))
      .map(_.mkString(" "))

  property("langIdNative equals the explode+aggregate formulation") =
    Prop.forAll(Gen.listOfN(6, langTextGen)) { texts =>
      val docs = (texts :+ null).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val native = TextOps.langIdNative(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val agg = TextOps.langIdAgg(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      native == agg
    }

  // ---- substringDedup: interval-union accounting vs brute force ---------

  property("substringDedup dup_tokens == brute-force position coverage") =
    Prop.forAll(
      Gen.choose(2, 4),
      Gen.listOfN(6, Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d")))) { (k, docs0) =>
      // small alphabet + short docs → cross-doc k-shingle collisions are
      // common, so the dup path is exercised, not vacuous
      val docs = docs0.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val got = TextOps.substringDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .select("doc_id", "n_tokens", "dup_tokens")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // reference: mark every token position covered by a shingle whose
      // k-gram occurs in ≥2 distinct docs, count marks per doc
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val owners = toks.toSeq
        .flatMap { case (id, ts) => ts.sliding(k).filter(_.size == k)
          .map(_.mkString(" ")).distinct.map(sh => sh -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      docs.forall { case (id, _) =>
        val ts = toks(id)
        val covered = Array.fill(ts.size)(false)
        ts.sliding(k).zipWithIndex.foreach { case (w, i) =>
          if (w.size == k && owners(w.mkString(" ")) >= 2)
            (i until i + k).foreach(covered(_) = true)
        }
        got(id) == ((ts.size.toLong, covered.count(identity).toLong))
      }
    }

  // ---- DDSketch log-bucket law (q_ddsketch_quantiles's kernel) ----------

  // The distribution-free guarantee the sketch claims: for any v ≥ 8
  // (msb ≥ 3 — price cents are ≥ 10⁴), the SQL bucket formulas both
  // engines share place v inside [lo, hi) with width/lo ≤ 1/8. Evaluated
  // through Spark SQL so the property tests the ACTUAL expressions, not a
  // Scala re-derivation.
  private val sketchVal: Gen[Long] = Gen.oneOf(
    Gen.choose(8L, 1L << 50),
    Gen.oneOf(8L, 9L, 15L, 16L, 17L, (1L << 50) - 1, 1L << 50),
  )

  property("ddsketch log-bucket brackets v with relative width <= 1/8") =
    Prop.forAll(Gen.listOfN(64, sketchVal)) { vs =>
      val rows = vs.toDF("c").selectExpr(
          "c",
          "length(bin(c)) - 1 AS m")
        .selectExpr("c",
          "m * 8 + (c * 8) div CAST(pow(2.0D, m) AS BIGINT) - 8 AS bkt")
        .selectExpr("c", "bkt",
          "((8 + bkt % 8) * CAST(pow(2.0D, bkt div 8) AS BIGINT)) div 8 AS lo",
          "((9 + bkt % 8) * CAST(pow(2.0D, bkt div 8) AS BIGINT)) div 8 AS hi")
        .as[(Long, Long, Long, Long)].collect()
      rows.forall { case (c, _, lo, hi) =>
        lo <= c && c < hi && (hi - lo) * 8 <= lo
      }
    }
}
