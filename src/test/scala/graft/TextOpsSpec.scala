package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenize: positions are 0-based and contiguous, empties dropped") {
    val docs = Seq((1L, "a b  c"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.tokenize(docs,
        graft.operators.Ops.normalizeText($"text"), Seq($"doc_id"))
      .select("doc_id", "pos", "token").as[(Long, Int, String)].collect().toSet
    assert(out == Set((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c")))
  }

  test("shingles: contiguous n-grams, none for docs shorter than n") {
    val toks = Seq((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c"), (1L, 3, "d"),
      (2L, 0, "x"), (2L, 1, "y")).toDF("doc_id", "pos", "token")
    val out = TextOps.shingles(toks, "doc_id", 3)
      .select("doc_id", "shingle").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("minhash signature: identical text gives identical signature") {
    val docs = Seq((1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick  brown fox jumps over the dog  "),
      (3L, "completely different words entirely here now ok")).toDF("doc_id", "text")
    val sig = TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4)
      .orderBy("doc_id").collect()
    assert(sig.length == 3)
    // doc2 normalizes to doc1's text → identical signatures
    assert(sig(0).toSeq.drop(1) == sig(1).toSeq.drop(1))
    assert(sig(0).toSeq.drop(1) != sig(2).toSeq.drop(1))
  }

  test("lshCandidatePairs surfaces identical docs as a candidate pair") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val sig = TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4)
    val pairs = TextOps.lshCandidatePairs(sig, "doc_id", 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("lshCandidatePairs: degenerate bucket is capped, drop count observed") {
    // adversarial corpus: every doc identical → ALL docs share every band
    // bucket; uncapped pair expansion would be O(n²)
    val n = 40
    val docs = (1L to n.toLong)
      .map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val sig = TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4)
    val pairs = TextOps.lshCandidatePairs(sig, "doc_id", 4, maxBucket = 10)
      .collect()
    // every band bucket holds all 40 docs > cap 10 → no pairs survive,
    // and the truncation is auditable as data, not silent
    assert(pairs.isEmpty)
    val dropped = TextOps.lshOversizedBuckets(sig, "doc_id", 4, maxBucket = 10)
      .as[(Int, String, Long)].collect()
    assert(dropped.length == 4 && dropped.forall(_._3 == n.toLong))
    // the observation channel reports the same count when the observed
    // stage survives AQE (it can be pruned when NOTHING passes the cap —
    // that corner is why the audit query above exists)
    val obs = org.apache.spark.sql.Observation()
    // two small docs share their buckets (size 2 ≤ cap → pair survives);
    // the 40-doc clone group's buckets are over the cap → dropped
    val mixed = Seq((101L, "one two three four five six"),
        (102L, "one two three four five six")).toDF("doc_id", "text")
      .union(docs)
    val sig2 = TextOps.minhashSignatureMd5(mixed, "doc_id", "text", 3, 4)
    val got = TextOps.lshCandidatePairs(sig2, "doc_id", 4,
      maxBucket = 10, dropObs = Some(obs)).as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 102L)))
    assert(obs.get("dropped_buckets").asInstanceOf[Long] == 4L)
    // the linear map path still dedups the whole corpus
    val dedup = TextOps.lshDedupMap(sig, "doc_id", 4)
      .as[(Long, Long)].collect().toMap
    assert((1L to n.toLong).forall(dedup(_) == 1L))
  }

  test("xxhash64 minhash signature agrees with itself and separates docs") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val sig = TextOps.minhashSignatureXx(docs, "doc_id", "text", 3, 8)
      .orderBy("doc_id").select("signature").as[Seq[Long]].collect()
    assert(sig(0) == sig(1))
    assert(sig(0) != sig(2))
    assert(sig(0).length == 8)
  }

  test("simhash64: identical docs distance 0; near-identical close; disjoint far") {
    val docs = Seq(
      (1L, "spark catalyst tungsten shuffle partition broadcast join agg"),
      (2L, "spark catalyst tungsten shuffle partition broadcast join agg"),
      (3L, "spark catalyst tungsten shuffle partition broadcast join extra"),
      (4L, "entirely unrelated vocabulary zebra quantum pineapple xylophone")).toDF("doc_id", "text")
    val sh = TextOps.simhash64(docs, "doc_id", "text")
    val m = sh.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) == 0)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("native simhash64 expression agrees with the aggregate formulation on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = TextOps.simhash64(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    val agg = TextOps.simhash64Agg(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(native.nonEmpty)
    assert(native == agg)
  }

  test("simhash64: tokenless docs are dropped; multibyte tokens hash like xxhash64") {
    val docs = Seq((1L, ""), (2L, "  \t "), (3L, "héllo wörld 北京")).toDF("doc_id", "text")
    val out = TextOps.simhash64(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(3L))
    val agg = TextOps.simhash64Agg(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(out == agg)
  }

  test("qualityScore arithmetic on a known document") {
    val docs = Seq((1L, "The cat and the hat!")).toDF("doc_id", "text")
    val r = TextOps.qualityScore(docs, "doc_id", "text", Seq("the", "and")).collect()(0)
    // normalized: "the cat and the hat!" → 5 tokens, 20 chars
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("n_chars_norm") == 20L)
    assert(r.getAs[Double]("stopword_ratio") == 0.6) // the, and, the
    assert(r.getAs[Double]("punct_ratio") == 0.05)   // the '!'
  }

  test("qualityScore: empty and whitespace-only docs degrade to null ratios, no ANSI throw") {
    val docs = Seq((1L, ""), (2L, "   \t \n "), (3L, "ok text")).toDF("doc_id", "text")
    val rows = TextOps.qualityScore(docs, "doc_id", "text", Seq("the"))
      .orderBy("doc_id").collect()
    for (r <- rows.take(2)) { // degenerate docs: norm = "" (split → [""], len 0)
      assert(r.getAs[Long]("n_chars_norm") == 0L)
      assert(r.isNullAt(r.fieldIndex("punct_ratio")))
    }
    assert(rows(2).getAs[Long]("n_tokens") == 2L) // healthy doc unaffected
    assert(rows(2).getAs[Double]("punct_ratio") == 0.0)
  }

  test("bpeishTokenCount splits letter runs, digit runs, punctuation") {
    val df = Seq("abc123!x y").toDF("s")
    // tokens: abc | 123 | ! | x | y
    val n = df.select(TextOps.bpeishTokenCount($"s")).as[Int].collect()(0)
    assert(n == 5)
  }

  test("langIdAgg matches the Column heuristic doc-for-doc (incl. empty docs)") {
    val docs = (Seq(
      "the cat is on the mat and happy",
      "der hund ist nicht hier und da",
      "el gato es la cosa y los perros",
      "le chat est une chose et les",
      "这是 中文 文本",
      "", "   ",
      "xyzzy plugh qwark") ++
      Tables.documents(spark, SF).select("text").as[String].take(20))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val viaAgg = graft.operators.TextOps.langIdAgg(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val viaCol = docs.select($"doc_id",
        graft.operators.TextOps.langIdHeuristic($"text").as("lang_pred"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(viaAgg == viaCol)
    assert(viaAgg.size == docs.count())
  }

  test("langIdHeuristic classifies script + stopword signals") {
    val df = Seq(
      ("the cat is on the mat and happy", "en"),
      ("der hund ist nicht hier und da", "de"),
      ("el gato es la cosa y los perros", "es"),
      ("le chat est une chose et les", "fr"),
      ("中文文本", "zh")).toDF("text", "expected")
    val out = df.select(TextOps.langIdHeuristic($"text").as("got"), $"expected")
      .as[(String, String)].collect()
    out.foreach { case (got, exp) => assert(got == exp, s"got $got want $exp") }
  }

  test("fingerprint equals md5 of normalized text and detects exact dups") {
    val docs = Seq((1L, "A  b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val fps = docs.select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("langIdAgg keeps empty and null documents as 'en'") {
    val docs = Seq((1L, "the cat and the hat is a"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "der hund ist nicht da und")).toDF("doc_id", "text")
    val out = TextOps.langIdAgg(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "en", 3L -> "en", 4L -> "de"))
  }

  test("lshDedupMap is single-hop; lshDedupClusters reaches the CC fixpoint") {
    // bucket chain: 1-2 share mh1='a', 2-3 share mh2='b', 3-4 share mh3='c'
    val sig = Seq(
      (1L, "a", "x2", "x3", "x4"),
      (2L, "a", "b", "y3", "y4"),
      (3L, "z1", "b", "c", "z4"),
      (4L, "w1", "w2", "c", "w4")
    ).toDF("doc_id", "mh1", "mh2", "mh3", "mh4")
    // single-hop: doc 4 only sees doc 3 through the 'c' bucket
    val oneHop = TextOps.lshDedupMap(sig, "doc_id", 4)
      .as[(Long, Long)].collect().toMap
    assert(oneHop(1L) == 1L && oneHop(2L) == 1L)
    assert(oneHop(3L) == 2L && oneHop(4L) == 3L)
    // iterated min-propagation converges: the whole chain labels 1
    val fixpoint = TextOps.lshDedupClusters(sig, "doc_id", 4)
      .as[(Long, Long)].collect().toMap
    assert(fixpoint == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("lshDedupClusters groups near-copy documents with real signatures") {
    // realistic dup shape: 10 base docs, 3 near-copies each (one token
    // appended) — copy groups are near-cliques in band space (diameter
    // 1-2), the regime the iteration is built for
    val base = Tables.documents(spark, SF).limit(10)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val corpus = base.flatMap { case (id, text) =>
      Seq((id * 10, text), (id * 10 + 1, text + " tail"), (id * 10 + 2, text + " fin"))
    }.toSeq.toDF("doc_id", "text")
    val sig = TextOps.minhashSignatureMd5(corpus, "doc_id", "text", 3, 4)
    val clusters = TextOps.lshDedupClusters(sig, "doc_id", 4)
      .as[(Long, Long)].collect().toMap
    // every near-copy group ends in ONE cluster labelled by its min id,
    // and pair candidates never straddle clusters
    base.foreach { case (id, _) =>
      val ids = Seq(id * 10, id * 10 + 1, id * 10 + 2)
      assert(ids.map(clusters).distinct.size == 1, s"group of $id split")
    }
    val pairs = TextOps.lshCandidatePairs(sig, "doc_id", 4)
      .as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("minhashEstimatedJaccard: estimator bounds, exact-dup pairs at 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick  brown fox jumps over the lazy dog"), // exact after norm
      (3L, "the quick brown fox jumps over the lazy cat"),  // near-dup
      (4L, "completely different words entirely here now ok")
    ).toDF("doc_id", "text")
    val sig = TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4)
    val est = TextOps.minhashEstimatedJaccard(sig, "doc_id", 4)
      .select("id_a", "id_b", "matches", "est_jaccard")
      .as[(Long, Long, Long, Double)].collect()
    val byPair = est.map(r => (r._1, r._2) -> r).toMap
    // banding admits a pair iff >= 1 family matches; estimator = matches/4
    est.foreach { case (a, b, m, e) =>
      assert(m >= 1 && m <= 4, s"($a,$b) matches=$m")
      assert(e == m / 4.0, s"($a,$b) est=$e m=$m")
    }
    assert(byPair((1L, 2L))._3 == 4L && byPair((1L, 2L))._4 == 1.0)
    assert(!byPair.contains((1L, 4L)) && !byPair.contains((2L, 4L)),
      "disjoint docs must not be candidates")
  }

  test("bm25TopK: hand-computed integer-exact scores and ranking") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple x y z"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, "doc_id", "text",
        Seq("apple", "banana"), 10)
      .as[(Long, Long)].collect().toSeq
    // N=3, Σdl=9, avgdl6=3e6; df(apple)=2, df(banana)=1
    // idf6(apple)=(1e6*3)div 5=600000; idf6(banana)=(1e6*5)div 3=1666666
    // doc1 dl=3: norm‰=1000 → apple(tf=2): (600000*2*2200)div 3200=825000
    //                         banana(tf=1): (1666666*2200)div 2200=1666666
    // doc2 dl=4: norm‰=1250 → apple(tf=1): (600000*2200)div 2500=528000
    assert(got == Seq((1L, 2491666L), (2L, 528000L)))
  }

  test("substringDedup: exact union coverage, drop/trim/keep decisions") {
    // doc1/doc2 share the 5-token span "v w x y z": doc2 IS that span →
    // fully covered → drop; doc1 is 10 tokens, 5 covered → drop exactly
    // at the half threshold. doc3 shares nothing → keep. doc4/doc5 share
    // the 7-token run "p q r s t u v" = three OVERLAPPING dup 5-shingles
    // (doc4 starts 0,1,2): union = 7 tokens, not 15 — the interval-union
    // accounting, not per-span double counting; 7 of doc4's 16 → trim,
    // 7 of doc5's 8 → drop.
    val docs = Seq(
      (1L, "a b c d e v w x y z"),
      (2L, "v w x y z"),
      (3L, "one two three four five six"),
      (4L, "p q r s t u v t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (5L, "head p q r s t u v")).toDF("doc_id", "text")
    val out = TextOps.substringDedup(docs, "doc_id", "text", 5)
      .select("doc_id", "n_tokens", "dup_tokens", "kept_tokens", "action")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 10L, 5L, 5L, "drop")), out(1L).toString)
    assert(out(2L) == ((2L, 5L, 5L, 0L, "drop")), out(2L).toString)
    assert(out(3L) == ((3L, 6L, 0L, 6L, "keep")), out(3L).toString)
    assert(out(4L) == ((4L, 16L, 7L, 9L, "trim")), out(4L).toString)
    assert(out(5L) == ((5L, 8L, 7L, 1L, "drop")), out(5L).toString)
  }
}
