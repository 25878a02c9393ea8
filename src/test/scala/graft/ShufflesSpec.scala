package graft

import org.apache.spark.sql.functions._

import graft.operators.Shuffles

class ShufflesSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Shuffles.writeBucketed(
        Tables.orders(spark, SF).select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_orderkey", 4)
      Shuffles.writeBucketed(
        Tables.lineitem(spark, SF)
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "b_lineitem", "o_orderkey", 4)
      val joined = Shuffles.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$p")
      assert(joined.count() == Tables.lineitem(spark, SF).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("provisionTable is get-or-create: second call is a no-op") {
    try {
      val df = Seq((1L, "x")).toDF("id", "name")
      val dir = java.nio.file.Files.createTempDirectory("graft_prov").toString
      // first call creates, and data written to the location is visible
      assert(Shuffles.provisionTable(spark, "prov_t", df.schema, s"$dir/t"))
      df.write.mode("append").parquet(s"$dir/t")
      assert(spark.table("prov_t").as[(Long, String)].collect().toSeq == Seq((1L, "x")))
      // second call (even with a DIFFERENT schema/path) leaves it untouched
      val other = Seq((2L, 3L)).toDF("a", "b")
      assert(!Shuffles.provisionTable(spark, "prov_t", other.schema, s"$dir/other"))
      assert(spark.table("prov_t").columns.toSeq == Seq("id", "name"))
      assert(spark.table("prov_t").count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS prov_t")
  }

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of left rows share one key — the shape salting exists for.
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (950L, "cold"), (999L, "cold")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).select("k", "v", "tag")
    val salted = Shuffles.saltedJoin(left, right, "k", salts = 8).select("k", "v", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin is deterministic across runs (no rand)") {
    val left = (1 to 100).map(i => (1L, i.toLong)).toDF("k", "v")
    val right = Seq((1L, "x")).toDF("k", "tag")
    val a = Shuffles.saltedJoin(left, right, "k", 4).orderBy("v").collect()
    val b = Shuffles.saltedJoin(left, right, "k", 4).orderBy("v").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("saltedJoin left outer / semi / anti equal their plain joins") {
    val left = ((1 to 500).map(i => (1L, i.toLong)) ++ Seq((7L, 0L), (8L, 0L)))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (7L, "cold")).toDF("k", "tag")
    for (jt <- Seq("left", "left_semi", "left_anti")) {
      val plain = left.join(right, Seq("k"), jt)
      val salted = Shuffles.saltedJoin(left, right, "k", salts = 8, joinType = jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"saltedJoin($jt) drifted from the plain join")
    }
  }

  test("saltedJoin rejects right/full outer joins (unmatched right rows would replicate)") {
    val left = Seq((1L, 1L)).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "unmatched")).toDF("k", "tag")
    for (jt <- Seq("right", "full", "full_outer", "right_outer"))
      intercept[IllegalArgumentException] {
        Shuffles.saltedJoin(left, right, "k", 4, joinType = jt)
      }
  }

  test("bloomSemiJoin equals the plain semi-join (false positives dropped)") {
    val left = (1L to 2000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val right = (1L to 2000L by 7).map(i => (i, "dim")).toDF("rk", "tag")
    val plain = left.join(right, left("k") === right("rk"), "left_semi")
    // tiny sketch + high fpp to force false positives through the filter
    val bloomed = Shuffles.bloomSemiJoin(left, right, "k", "rk",
      expectedItems = 300L, fpp = 0.2)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloomSemiJoin keeps no null-key rows") {
    val left = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "payload")
    val right = Seq(Tuple1(1L)).toDF("rk")
    val out = Shuffles.bloomSemiJoin(left, right, "k", "rk").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("a"))
  }
}
