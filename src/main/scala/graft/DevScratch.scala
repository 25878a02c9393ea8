package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Ops, TextOps}

/** Throwaway stage-by-stage profiler for the minhash pipeline. */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time(label: String)(df: => DataFrame): Unit = {
      // warmup + 2 timed
      df.write.mode("overwrite").format("noop").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-28s min=${ts.min}%.3f s")
    }

    val docs = Tables.documents(spark, sf)
    time("docs_scan")(docs)
    time("normalize_split")(docs.select(col("doc_id"),
      explode(split(Ops.normalizeText(col("text")), " ")).as("token")))
    time("tokenize_posexplode")(TextOps.tokenize(docs, Ops.normalizeText(col("text")), Seq(col("doc_id"))))
    time("exploded_shingles")(TextOps.explodedShingles(docs, "doc_id", "text", 3))
    time("shingles_md5x1")(TextOps.explodedShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), md5(col("shingle")).as("h")))
    time("minhash_sig_md5x4")(TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4))
    time("lsh_pairs_full")(Queries.qMinhashDedup(spark, sf))
    time("simhash64")(TextOps.simhash64(docs, "doc_id", "text"))
    time("simhash64_agg")(TextOps.simhash64Agg(docs, "doc_id", "text"))
    time("q_ann_ivf")(Queries.all("q_ann_ivf")(spark, sf))
    val ev = Tables.events(spark, sf)
    time("json_struct_full")(Queries.all("q_json_struct")(spark, sf))
    time("json_struct_nosort")(ev.select(col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))).getField("k").as("k")))
    time("json_getobj_nosort")(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k")))
    time("sort_only_events")(ev.select(col("event_id"), col("user_id")).orderBy("event_id"))
    time("date_parse_full")(Queries.all("q_date_parse")(spark, sf))
    val ords = Tables.orders(spark, sf)
    val rawCol = when(pmod(col("o_orderkey"), lit(3)) === 0, date_format(col("o_orderdate"), "yyyy"))
      .when(pmod(col("o_orderkey"), lit(3)) === 1, date_format(col("o_orderdate"), "yyyy-MM"))
      .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
    time("dp_gen_only")(ords.select(col("o_orderkey"), rawCol.as("release_date")))
    time("dp_gen_parse_nosort")(ords.select(col("o_orderkey"), rawCol.as("release_date"))
      .withColumn("parsed", coalesce(try_to_date(col("release_date"), "yyyy-MM-dd"),
        try_to_date(col("release_date"), "yyyy-MM"), try_to_date(col("release_date"), "yyyy"))))
    time("quality_full")(Queries.all("q_quality_score")(spark, sf))
    time("q_set_ops")(Queries.all("q_set_ops")(spark, sf))
    time("q_entity_counts")(Queries.all("q_entity_counts")(spark, sf))
    time("q_percentiles")(Queries.all("q_percentiles")(spark, sf))
    val melted = Tables.lineitem(spark, sf).select(col("l_returnflag"),
      expr("stack(2, 'price', CAST(l_extendedprice AS DOUBLE), 'qty', CAST(l_quantity AS DOUBLE)) AS (metric, v)"))
    time("pct_melt_scan")(melted)
    time("pct_full")(Ops.exactPercentiles(melted, Seq("l_returnflag", "metric"), "v",
      Seq(("p25", 0.25), ("p50", 0.5), ("p90", 0.9))))
    val vals = melted.select(col("l_returnflag"), col("metric"), col("v").cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .withColumn("__bucket", shiftright(graft.functions.OrderedBits.orderedBits(col("__v")), 44))
    time("pct_counts_job")(vals.groupBy(col("l_returnflag"), col("metric"), col("__bucket")).count())
    time("pct_window_nojoin")(vals.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("l_returnflag"), col("metric"), col("__bucket")).orderBy(col("__v")))))
    spark.stop()
  }
}
