package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def cosineRef(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine column matches hand computation") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 1f, 0f), Array(1f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("cosineTopK matches brute-force reference on real embeddings") {
    val emb = Tables.embeddings(spark, SF)
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val probe = rows.find(_._1 == 0L).get._2
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosineRef(v, probe)) }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(10).map(_._1).toSeq
    val got = Similarity.cosineTopK(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("cosineTopKLsh achieves high recall vs exact top-10") {
    val emb = Tables.embeddings(spark, SF)
    val probe = emb.where($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val exact = Similarity.cosineTopK(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.cosineTopKLsh(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10,
        nBits = 12, hamming = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // exact-value pin: seeded hyperplanes + fixed fixture make this fully
    // deterministic — a silent bucketing/probing regression moves the value
    assert(recall == 0.8, s"recall $recall != pinned 0.8; got=$approx want=$exact")
  }

  test("cosineTopKLsh with hamming == nBits is exactly brute force") {
    // the honest endpoint of the LSH recall dial (q_ann_lsh_exact's
    // contract): every vector passes the bucket filter, so bucket→filter→
    // rerank must reproduce the exact top-10 bit-for-bit
    val emb = Tables.embeddings(spark, SF)
    val probe = emb.where($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val exact = Similarity.cosineTopK(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val full = Similarity.cosineTopKLsh(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10,
        nBits = 8, hamming = 8)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    assert(full == exact, s"got=$full want=$exact")
  }

  test("embeddingNearDupPairs finds planted near-duplicates only") {
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val far = Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.999, nBits = 4, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ivfTopK with nprobe == nlist is exactly brute force") {
    val emb = Tables.embeddings(spark, SF)
    val probe = emb.where($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val brute = Similarity.cosineTopK(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10)
      .select("vec_id").as[Long].collect().toSeq
    val exhaustive = Similarity.ivfTopK(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10,
        nlist = 8, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(exhaustive == brute) // every list scanned ⇒ identical ranking
  }

  test("ivfTopK pruned scan returns k results with nonzero recall, deterministically") {
    val emb = Tables.embeddings(spark, SF)
    val probe = emb.where($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    def run() = Similarity.ivfTopK(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10,
        nlist = 16, nprobe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val a = run()
    assert(a.size == 10)
    assert(a == run()) // seeded centroids + total tie order ⇒ stable
    val exact = Similarity.cosineTopK(
        emb.where($"vec_id" =!= 0), "vec_id", "embedding", probe, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect a.toSet).size.toDouble / exact.size
    // exact-value pin: seeded centroids + total tie order make the pruned
    // scan deterministic — a regression in list assignment moves the value
    assert(recall == 0.4, s"pruned-IVF recall $recall != pinned 0.4")
  }

  test("kmeansStep: exact assignment and per-dim means on a known fixture") {
    // seeds = two smallest ids: c1=(0,0), c2=(10,10); members split cleanly
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 10.0f)),
      (3L, Seq(0.0f, 2.0f)), (4L, Seq(9.0f, 10.0f))).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(emb, "vec_id", "embedding", 2)
      .orderBy("cluster_id", "pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // `c` is 4-dp fixed point (units of 1e-4)
    assert(out == Seq(
      (1L, 0L, 0L, 2L), (1L, 1L, 10000L, 2L),      // mean of (0,0),(0,2)
      (2L, 0L, 95000L, 2L), (2L, 1L, 100000L, 2L))) // mean of (10,10),(9,10)
  }

  test("kmeansStep: equidistant vector ties to the smaller cluster id") {
    val emb = Seq(
      (1L, Seq(0.0f)), (2L, Seq(2.0f)),
      (5L, Seq(1.0f))).toDF("vec_id", "embedding") // exactly between
    val out = Similarity.kmeansStep(emb, "vec_id", "embedding", 2)
      .where($"pos" === 0).orderBy("cluster_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 5000L, 2L), (2L, 0L, 20000L, 1L)))
  }

  test("kmeansIterate recovers well-separated blobs from bad seeds") {
    // both seeds (smallest ids) start inside blob A; Lloyd must pull one
    // centroid across to blob B within a few rounds
    val blobA = (1L to 6L).map(i => (i, Seq(0.0f + i * 0.01f, 0.0f)))
    val blobB = (11L to 16L).map(i => (i, Seq(100.0f + i * 0.01f, 100.0f)))
    val emb = (blobA ++ blobB).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansIterate(emb, "vec_id", "embedding", 2, 5)
    val assigned = emb.withColumn("c",
        Similarity.kmeansAssignCol("embedding", cents))
      .select($"vec_id", $"c").as[(Long, Long)].collect().toMap
    val aClusters = blobA.map(v => assigned(v._1)).distinct
    val bClusters = blobB.map(v => assigned(v._1)).distinct
    assert(aClusters.size == 1 && bClusters.size == 1,
      s"each blob must land in one cluster: $assigned")
    assert(aClusters.head != bClusters.head, "blobs must separate")
    // centroids sit at the blob means (rounded path through kmeansStep)
    val cMap = cents.toMap
    assert(math.abs(cMap(aClusters.head)(1) - 0.0) < 1e-6)
    assert(math.abs(cMap(bClusters.head)(1) - 100.0) < 1e-6)
  }

  test("kmeansIterate: a cluster that loses all members keeps its centroid") {
    // seed 2 = (0.1): every point is closer to seed 1 after one round
    val emb = Seq((1L, Seq(0.0f)), (2L, Seq(0.1f)), (3L, Seq(0.05f)))
      .toDF("vec_id", "embedding")
    val one = Similarity.kmeansIterate(emb, "vec_id", "embedding", 2, 1)
    // round 1: 1,3 -> c1 (mean 0.025), 2 -> c2 (mean 0.1)
    assert(one.toMap.apply(1L).toSeq == Seq(0.025) &&
      one.toMap.apply(2L).toSeq == Seq(0.1))
    val five = Similarity.kmeansIterate(emb, "vec_id", "embedding", 2, 5)
    assert(five.length == 2) // k stays 2 even if a cluster empties
  }

  test("quantizeInt8: exact codes, scale, and reconstruction error") {
    val emb = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Double, String, Double)].collect()
    // -0.5*127 = -63.5 rounds HALF_UP away from zero → -64
    assert(out(0) == ((1L, 0.007874, "127,-64,0", 0.003937)))
    assert(out(1) == ((2L, 0.0, "0,0,0", 0.0)))
    // round trip: codes * scale reconstruct within scale/2 per element
    val codes = out(0)._3.split(",").map(_.toInt)
    val rec = codes.map(_ * (1.0 / 127.0))
    Seq(1.0, -0.5, 0.0).zip(rec).foreach { case (x, r) =>
      assert(math.abs(x - r) <= 0.5 / 127.0 + 1e-12)
    }
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference argmin cluster assignment (squared L2, ties to smallest id),
    * independent of the Column implementation under test. */
  private def assignRef(v: Array[Float],
                        cents: Array[(Long, Array[Double])]): Long =
    cents.map { case (cid, c) =>
      var s = 0.0; var i = 0
      while (i < c.length) { val d = v(i).toDouble - c(i); s += d * d; i += 1 }
      (s, cid)
    }.minBy { case (s, cid) => (s, cid) }._2

  test("knnJoinExact matches per-query brute force on real embeddings") {
    val emb = Tables.embeddings(spark, SF)
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val q = emb.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val got = Similarity.knnJoinExact(emb, "vec_id", "embedding", q, 3)
      .select("q_id", "n_id", "rk").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._3).map(_._2).toSeq }
    val queries = rows.filter(_._1 % 100 == 0)
    assert(got.keySet == queries.map(_._1).toSet)
    queries.foreach { case (qid, qv) =>
      val expected = rows.filter(_._1 != qid)
        .map { case (id, v) => (id, round4(cosineRef(v, qv))) }
        .sortBy { case (id, s) => (-s, id) }
        .take(3).map(_._1).toSeq
      assert(got(qid) == expected, s"query $qid")
    }
  }

  test("knnJoinBlocked == exact kNN restricted to the query's cluster") {
    val emb = Tables.embeddings(spark, SF)
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val q = emb.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val got = Similarity.knnJoinBlocked(emb, "vec_id", "embedding", q, 3, cents)
      .select("q_id", "n_id", "rk").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._3).map(_._2).toSeq }
    val byCluster = rows.groupBy { case (id, v) => assignRef(v, cents) }
    rows.filter(_._1 % 100 == 0).foreach { case (qid, qv) =>
      val cluster = byCluster(assignRef(qv, cents))
      val expected = cluster.filter(_._1 != qid)
        .map { case (id, v) => (id, round4(cosineRef(v, qv))) }
        .sortBy { case (id, s) => (-s, id) }
        .take(3).map(_._1).toSeq
      assert(got.getOrElse(qid, Seq.empty[Long]) == expected, s"query $qid")
    }
  }

  test("semDedupPairs == threshold pairs within reference clusters") {
    val emb = Tables.embeddings(spark, SF)
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val expected = (for {
      (a, va) <- rows; (b, vb) <- rows
      if a < b && assignRef(va, cents) == assignRef(vb, cents)
      sim = round4(cosineRef(va, vb)) if sim >= 0.3
    } yield (a, b, sim)).toSet
    val got = Similarity.semDedupPairs(emb, "vec_id", "embedding", 8, 0.3)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("kmeansAssignJoined ≡ kmeansAssignCol: the broadcast-table and inlined " +
      "assignment forms agree on every vector (numerics and tie-break)") {
    val emb = Tables.embeddings(spark, SF)
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val joined = Similarity
      .kmeansAssignJoined(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cluster_id"))
    val inlined = emb.select(col("vec_id"),
      Similarity.kmeansAssignCol("embedding", cents).as("cluster_id"))
    assert(joined.except(inlined).count() == 0
      && inlined.except(joined).count() == 0)
  }

  test("hyperplanes are deterministic for a given seed") {
    val a = Similarity.hyperplanes(8, 16, 42L)
    val b = Similarity.hyperplanes(8, 16, 42L)
    val c = Similarity.hyperplanes(8, 16, 43L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }
}
