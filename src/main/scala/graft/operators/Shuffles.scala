package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-management operators: bucketed (pre-shuffled) table layout for
  * co-located joins, and key salting for skew. These are the two knobs
  * that decide whether a repeated 100 TB join is a metadata operation or a
  * cluster-wide reshuffle. */
object Shuffles {

  /** Persist `df` bucketed (and sorted) by `key` into the session catalog.
    * A pair of tables bucketed on the same key with the same bucket count
    * joins with ZERO exchanges — the shuffle is paid once at write time and
    * amortized over every subsequent join/aggregation on that key. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Idempotent storage provisioning — the reference get-or-creates its
    * landing bucket before any write (create_bucket.py:10-26: look up, and
    * only create on not-found). Re-expressed as catalog provisioning:
    * register an EXTERNAL parquet table `name` over `path` with an explicit
    * `schema`, only if absent. Safe to call from every pipeline run and
    * from concurrent runs — `CREATE TABLE IF NOT EXISTS` makes the race
    * benign, and an existing table (whatever its layout) is left untouched.
    * Returns true iff this call created the table. Pure catalog metadata:
    * no job, no data files touched. */
  def provisionTable(spark: SparkSession, name: String,
                     schema: org.apache.spark.sql.types.StructType,
                     path: String): Boolean = {
    if (spark.catalog.tableExists(name)) false
    else {
      spark.sql(s"CREATE TABLE IF NOT EXISTS $name (${schema.toDDL}) " +
        s"USING PARQUET LOCATION '${path.replace("'", "''")}'")
      true
    }
  }

  /** Equi-join two bucketed catalog tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** Join types for which replicating the right side once per salt is
    * semantics-preserving: the output is driven entirely by left rows, so
    * an unmatched right row is never emitted (let alone `salts` times). */
  private val saltableJoinTypes = Set(
    "inner", "cross",
    "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti")

  /** Skew-safe equi-join: spread each hot left key over `salts` subkeys and
    * replicate the right side once per salt. The left salt is derived
    * deterministically from the whole left row (no `rand()` — reruns and
    * retries stay stable). Use when one key holds a disproportionate share
    * of rows and AQE's skew splitting isn't available (e.g. a non-AQE sink
    * or a broadcast-ineligible dimension).
    *
    * Only left-driven join types are accepted (inner / cross / left outer /
    * left semi / left anti) — for those the result is identical to the
    * plain join. Right/full outer joins would emit each unmatched right
    * row once per salt replica; salt the other side instead. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(saltableJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' is not left-driven; the replicated " +
        "right side would duplicate unmatched right rows. Salt the left-driven " +
        "mirror of the join instead.")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Semi-join with a bloom RUNTIME FILTER on the probe side — the
    * standard big-fact ⋈ selective-dim optimization: build a bloom sketch
    * of the right side's keys (one small aggregation), pre-filter the fact
    * table with the codegen'd [[graft.functions.BloomMightContain]]
    * predicate INSIDE its scan stage, and only the surviving ~|matches|·
    * (1+fpp) rows ride the shuffle into the exact semi-join. At 100 TB the
    * shuffle, not the join, is the cost — a 1%-selective dim cuts shuffled
    * bytes ~100×; false positives are dropped by the exact join, so the
    * result is bit-identical to the plain semi-join (the DuckDB oracle of
    * the declared query states exactly that plain join).
    *
    * `expectedItems` sizes the sketch (n·ln(1/fpp)/ln²2 bits ≈ 1.2 MB for
    * 1 M keys at 1%) — overestimate safely; it broadcasts with the plan.
    *
    * NOTE: the sketch build (`stat.bloomFilter`) is an EAGER aggregation
    * job at call time — constructing the returned plan already scans the
    * right side once (runtime filters are inherently built by execution;
    * Spark's own AQE runtime filters do the same inside the plan). Call
    * once and reuse the returned frame rather than re-invoking per
    * inspection. */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, leftKey: String,
                    rightKey: String, expectedItems: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame = {
    // On a zero-row build side Spark's bloomFilter aggregate yields a null
    // sketch buffer (NPE on first probe) — union ONE sentinel key so the
    // sketch always materializes. A sentinel false positive is harmless by
    // the operator's own construction: the exact semi-join behind the
    // filter decides truth; on a non-empty build side the sentinel merely
    // occupies ~k bits of the sized-for-expectedItems filter.
    val bf = right.select(col(rightKey).cast("long").as(rightKey))
      .unionAll(right.sparkSession.range(1)
        .select(lit(Long.MinValue).as(rightKey)))
      .stat.bloomFilter(rightKey, expectedItems, fpp)
    val prefiltered = left.where(
      graft.functions.BloomMightContain.mightContain(col(leftKey), bf))
    prefiltered.join(right, prefiltered(leftKey) === right(rightKey), "left_semi")
  }

  /** Interval-overlap self-join under a partition key: all pairs of rows
    * sharing `keyCol` whose half-open intervals `[startCol, endCol)`
    * overlap, emitted once (`id_a < id_b`). Output columns:
    * `(k, id_a, s_a, e_a, id_b, s_b, e_b)`.
    *
    * The join condition is EQUI on the key — the shuffle co-partitions both
    * sides by `keyCol` and the overlap test (`s_a < e_b AND s_b < e_a`) is
    * a residual filter inside each matched group, so the plan is a
    * hash/sort-merge join, never a cartesian product. Pair count is
    * O(Σ n_k²) over per-key group sizes n_k — safe whenever the key bounds
    * group size (per-customer, per-device, per-session); for keyless or
    * mega-key interval sets, bin both sides by fixed-width windows first
    * (cf. [[graft.operators.Ops.binnedRangeJoin]]) so a pair only meets in
    * its overlapping bins. */
  def intervalOverlapSelfJoin(df: DataFrame, keyCol: String, idCol: String,
                              startCol: String, endCol: String): DataFrame = {
    val a = df.select(col(keyCol).as("k"), col(idCol).as("id_a"),
      col(startCol).as("s_a"), col(endCol).as("e_a"))
    val b = df.select(col(keyCol).as("k"), col(idCol).as("id_b"),
      col(startCol).as("s_b"), col(endCol).as("e_b"))
    a.join(b, Seq("k"))
      .where(col("id_a") < col("id_b") &&
        col("s_a") < col("e_b") && col("s_b") < col("e_a"))
  }
}
