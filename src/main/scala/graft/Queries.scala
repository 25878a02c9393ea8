package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSim.cosine_sim
import graft.operators.{Checkpoints, EventAnalytics, Graph, Ops, Shuffles, Similarity, TextOps, TrainPrep}

/** The declared query inventory (SURVEY.md §2.3): each entry re-expresses a
  * surveyed operator of the reference pipeline on the harness tables, paired
  * (where SQL-expressible) with an ANSI/DuckDB oracle in [[Queries.oracleSql]].
  *
  * Determinism contract (hash-match against the oracle):
  *  - every output totally ordered by its key columns;
  *  - no nondeterministic `dropDuplicates` winners — `row_number` first-wins;
  *  - aggregated doubles rounded; passthrough doubles left untouched
  *    (bit-identical from the shared parquet);
  *  - integer-width parity with DuckDB (row_number/length/size cast to long);
  *  - hashes restricted to portable md5 / explicit Knuth arithmetic.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** [[graft.operators.Ops.presentSorted]] as a transform: final total
    * order for bounded-cardinality aggregate outputs without the range
    * sort's sampling pass. Only used where the row count is bounded by a
    * constant (enum/calendar group keys) — O(input) outputs keep orderBy. */
  private def ps(cols: Column*)(df: DataFrame): DataFrame =
    Ops.presentSorted(df, cols: _*)

  /** Overflow-safe exact ppm: `floor(num·10⁶ / den)` via two-step long
    * division (`a = num·1000; a div den · 1000 + (a mod den)·1000 div den`)
    * — exact for any `num, den ≤ 2⁶³/1000` whose scaled quotient itself
    * fits in a long (always true for share semantics, num ≤ den), where
    * the naive `num · 10⁶` overflows once `num > 9.2·10¹²` (ANSI mode
    * turns that into a runtime error — caught live by the 10× scale study
    * on cent totals). The SQL twin below keeps the oracle
    * expression-identical. */
  private[graft] def scaledDiv(num: String, den: String, s1: Long, s2: Long): String =
    s"(($num * $s1) div $den) * $s2 + ((($num * $s1) % $den) * $s2) div $den"

  private[graft] def scaledDivSql(num: String, den: String, s1: Long, s2: Long): String =
    s"(($num * $s1) // $den) * $s2 + ((($num * $s1) % $den) * $s2) // $den"

  private[graft] def ppmDiv(num: String, den: String): String =
    scaledDiv(num, den, 1000L, 1000L)

  private def ppmDivSql(num: String, den: String): String =
    scaledDivSql(num, den, 1000L, 1000L)

  /** Exact ROUND-HALF-UP of the nonnegative integer ratio `num/den` into
    * `pow` (= 10^k) fixed-point units, overflow-safe via the
    * quotient+remainder split (the remainder product stays < 2·den·pow).
    * Present as a double with ONE division by `pow` — an identical IEEE
    * op in both engines. The double `round(num/den, k)` is NOT portable:
    * an integer ratio lands EXACTLY on a .xx5 boundary whenever its
    * reduced denominator carries a factor of 5 at rounding scale (group
    * counts are routinely divisible by 5), and there BigDecimal-HALF_UP
    * (Spark) and multiply-round-divide (DuckDB) disagree — the
    * q_percentiles flip, generalized to every averaged ratio. */
  private[graft] def roundDiv(num: String, den: String, pow: Long): String =
    s"(($num div $den) * $pow + (2 * ($num % $den) * $pow + $den) div (2 * $den))"

  private def roundDivSql(num: String, den: String, pow: Long): String =
    s"(($num // $den) * $pow + (2 * ($num % $den) * $pow + $den) // (2 * $den))"

  private val STOPWORDS = Seq("the", "and", "of", "to", "a", "is")
  private val STOP_SQL = STOPWORDS.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Shared CTE prefix for normalized-text oracles. */
  private val NORM_CTE =
    """WITH norm AS (SELECT doc_id, lang, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)"""

  /** Shared CTE chain for shingle/minhash oracles: 3-word shingles of the
    * normalized text, then 4 min-hash families as 8-hex-char slices of one
    * md5 per shingle (matching [[graft.operators.TextOps.minhashSignatureMd5]]). */
  private val SIG_CTE = NORM_CTE +
    """, tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm)""" +
    """, sh AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))""" +
    """, dig AS (SELECT doc_id, md5(shingle) AS h FROM sh WHERE shingle IS NOT NULL)""" +
    """, sig AS (SELECT doc_id, min(substr(h, 1, 8)) AS mh1, min(substr(h, 9, 8)) AS mh2, min(substr(h, 17, 8)) AS mh3, min(substr(h, 25, 8)) AS mh4 FROM dig GROUP BY doc_id)"""

  // ---------------------------------------------------------------- scans

  /** S22/S12 — fixed-column projection (pushed to the parquet scan). */
  def qScanProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
      // every output column participates in the sort: the fixture does NOT
      // guarantee (l_orderkey, l_linenumber) unique, so a shorter prefix is
      // not a total order and tied rows could legally differ between
      // engines (first seen live at sf1 — 1.18 M duplicate key pairs)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))

  /** S2/S9 — predicate filters (pushed down to the scan). */
  def qFilterNonnull(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("props").isNotNull && col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  // ---------------------------------------------------------------- dedup

  /** S9 — set-dedup of ids. */
  def qDistinctIds(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("user_id").distinct().orderBy("user_id")

  /** S19 — sorted distinct. */
  def qSortedDistinct(s: SparkSession, d: String): DataFrame =
    Ops.sortedDistinct(Tables.lineitem(s, d), "l_partkey")

  /** S14/S20 — first-occurrence dedup with a deterministic total order. */
  def qDedupFirstWins(s: SparkSession, d: String): DataFrame =
    Ops.dedupFirstWins(Tables.events(s, d), Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"))

  /** S16/S21 — pair-dedup. */
  def qDedupPairs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")

  // ------------------------------------------------- sampling / chunking

  /** S10 — deterministic seeded sample-N via Knuth-hash order
    * (TakeOrderedAndProject: per-partition heap, no global sort). */
  def qSeededSample(s: SparkSession, d: String): DataFrame =
    Ops.seededTopN(Tables.customer(s, d), "c_custkey", 20)

  /** S3 — fixed-size chunking / 1-based batch assignment, via the scalable
    * two-phase numbering (bucket offsets + bucket-local windows): no global
    * single-partition window anywhere in the plan. */
  def qBatchAssign(s: SparkSession, d: String): DataFrame =
    Ops.batchAssignScalable(Tables.customer(s, d).select("c_custkey", "c_name"),
        "c_custkey", 500)
      .orderBy("c_custkey")

  // ------------------------------------------------------------- strings

  /** S6/S7 — whitespace normalization + lowercase. */
  def qNormalizeText(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), Ops.normalizeText(col("text")).as("norm_text"))
      .orderBy("doc_id")

  /** S12 — nested/JSON field extraction with typed cast. */
  def qJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(col("k"))

  // --------------------------------------------------------------- joins

  /** S16/S21 — bridge-table construction through a join. */
  def qBridgeTable(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_name").distinct()
      .orderBy("o_orderkey")

  /** S18 — FK-driven scan as a left-semi join. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).where(col("o_orderstatus") === "F").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      // l_quantity joins the sort: (l_orderkey, l_linenumber) is not unique
      // in the fixture, so the full column set makes the order total
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  // -------------------------------------------------------- partitioning

  /** S23/S24 — run-date partition layout as a group key. */
  def qPartitionedCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n"))
      .transform(ps(col("event_date")))

  /** S24 — load verification: row count per entity, answered from parquet
    * FOOTER metadata ([[graft.sources.ParquetMeta]]) — COUNT(*) needs no
    * column I/O; a 100 TB table counts in O(files) distributed footer
    * reads (the same pushdown the DuckDB oracle applies natively). */
  def qEntityCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.entityNames.map { name =>
      (name, graft.sources.ParquetMeta.rowCount(s, s"$d/$name.parquet"))
    }.toDF("entity", "n").transform(ps(col("entity")))
  }

  // ----------------------------------------------------------- analytics

  /** TPC-H Q1-shaped pricing summary (the BigQuery-delegated tier). */
  def qAggPricing(s: SparkSession, d: String): DataFrame =
    // TPC-H Q1 in EXACT integer units (qty, price cents, discount 1e-4):
    // sums are exact longs (the discounted extension in 1e-6-dollar units
    // — pc·(10⁴−d4) — is order-free where the double sum drifts with
    // partitioning), averages are exact round-half-up integer division
    // (roundDiv — a plain round(avg(x), 2) flips engines whenever the
    // group count puts the mean exactly on a .xx5 boundary). Final
    // presentation divisions are single IEEE ops, identical both engines.
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_quantity, 0) AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("pc"),
        expr("CAST(round(l_discount * 10000, 0) AS BIGINT)").as("d4"))
      .groupBy("l_returnflag", "l_linestatus")
      // Headroom bound: the 1e-6-dollar discounted term pc·(10⁴−d4)
      // reaches ~10¹¹ per row, so a per-group int64 sum holds to ~9·10⁷
      // rows/group ≈ sf150–200 — two orders past this engine's proven
      // range but ~100× tighter than the cents sums (DuckDB's BIGINT sum
      // promotes to HUGEINT, so past the bound the engines would silently
      // diverge rather than both fail). Before running beyond ~sf100,
      // split the group (e.g. sub-aggregate by month then merge as
      // DECIMAL(38,0)) or flip on spark.sql.ansi.enabled so overflow
      // throws instead of wrapping.
      .agg(sum(col("q")).as("sq"), sum(col("pc")).as("spc"),
        sum(expr("pc * (10000 - d4)")).as("se6"), sum(col("d4")).as("sd4"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sq").cast("double").as("sum_qty"),
        (col("spc").cast("double") / 100.0).as("sum_base"),
        (col("se6").cast("double") / 1000000.0).as("sum_disc"),
        (expr(roundDiv("sq", "n", 100L)).cast("double") / 100.0).as("avg_qty"),
        (expr(roundDiv("spc", "n", 1L)).cast("double") / 100.0).as("avg_price"),
        (expr(roundDiv("sd4", "n", 1L)).cast("double") / 10000.0).as("avg_disc"),
        col("n"))
      .transform(ps(col("l_returnflag"), col("l_linestatus")))

  /** Revenue per nation: 3-way join star query. `nation` (25 rows) is
    * explicitly broadcast; orders⋈customer⋈lineitem shuffle on their keys
    * and AQE handles skew at scale. */
  def qJoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .transform(ps(col("n_name")))

  /** Top-3 orders per customer (window top-k). */
  def qWindowTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Running sum per user (window frame). The cumulative additions happen in
    * the identical order in any engine given the same total order, so the
    * double is bit-stable; rounded anyway for defense. */
  def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), round(sum(col("value")).over(w), 2).as("running"))
      .orderBy("user_id", "event_id")
  }

  /** S9 set semantics — EXCEPT: customers with orders minus customers with a
    * returned lineitem. */
  def qSetOps(s: SparkSession, d: String): DataFrame = {
    val withOrders = Tables.orders(s, d).select("o_custkey")
    val withReturns = Tables.orders(s, d)
      .join(Tables.lineitem(s, d).where(col("l_returnflag") === "R").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey")
    withOrders.except(withReturns).orderBy("o_custkey")
  }

  /** North-star scale: HLL sketch vs exact distinct (no oracle — approx). */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"))

  // ------------------------------------------------- text / LLM-data tier

  /** Token frequency: top-10 tokens per language. */
  def qTextTokens(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("lang"), explode(split(Ops.normalizeText(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
    val counted = toks.groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("token"))
    counted.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 10)
      .orderBy("lang", "rn")
  }

  /** Portable MinHash signatures (4 salted-md5 hashes over 3-word shingles). */
  def qMinhashSignature(s: SparkSession, d: String): DataFrame =
    TextOps.minhashSignatureMd5(Tables.documents(s, d), "doc_id", "text", 3, 4)
      .orderBy("doc_id")

  /** MinHash-LSH candidate near-dup pairs: docs agreeing on ≥1 of 4 bands.
    * Band buckets over 1000 members are skipped (mirrored in the oracle) —
    * the quadratic pair expansion is demo-tier; [[qMinhashDedupMap]] is the
    * linear scale path that still covers docs in skipped buckets. */
  def qMinhashDedup(s: SparkSession, d: String): DataFrame = {
    val sig = TextOps.minhashSignatureMd5(Tables.documents(s, d), "doc_id", "text", 3, 4)
    TextOps.lshCandidatePairs(sig, "doc_id", 4).orderBy("id_a", "id_b")
  }

  /** Exact set-similarity join via PREFIX FILTERING (AllPairs/PPJoin
    * family) — the DETERMINISTIC-recall complement to the MinHash-LSH
    * candidate join: within the declared universe it finds EVERY pair
    * with Jaccard ≥ 0.7, no probabilistic misses. Sets are each doc's
    * distinct 3-shingles with global df ≤ 10 (the universe cap — the
    * same stopword-frequency argument as [[qNgramJaccard]]'s posting cap:
    * a shingle shared by more documents is boilerplate that contributes
    * ~0 to a 0.7-Jaccard ranking but quadratic pair mass; similarity is
    * DEFINED over the capped universe, so the result stays exact, not
    * approximate). The filter: order each set by ascending global df
    * (rarest first — one doc-keyed window), keep only the first
    * `|T| − ⌈0.7·|T|⌉ + 1` shingles as the PREFIX; two sets with
    * Jaccard ≥ t MUST share a prefix element under any consistent
    * global order, so the shingle-keyed self-join of prefixes generates
    * a complete candidate set while touching only the rarest postings.
    *
    * PPJoin pruning (Xiao et al.) cuts the verify input BEFORE the
    * exact-intersection joins ever see a pair: (1) the LENGTH filter
    * rides the candidate join itself — `J ≥ 0.7` forces
    * `10·min(|A|,|B|) ≥ 7·max(|A|,|B|)`; (2) the POSITIONAL filter uses
    * the consistency of the (df, shingle) total order: both prefixes are
    * sorted by the SAME global order, so the shared prefix matches of a
    * pair are co-monotone — `max(rn_a)` and `max(rn_b)` land on the same
    * token, and every shared token NOT matched in both prefixes sits
    * strictly beyond that last match in BOTH sets. Hence
    * `|A∩B| ≤ np + min(|A|−pa, |B|−pb)` (np = shared-prefix count,
    * pa/pb = last-match positions), and `J ≥ 0.7` needs
    * `|A∩B| ≥ ⌈7(|A|+|B|)/17⌉` — pairs whose bound can't reach it are
    * pruned with integer-exact arithmetic, changing nothing in the
    * output (the bound is sound, only impossible pairs die).
    * Verification computes the exact intersection per surviving
    * candidate (two co-keyed joins against the full capped sets) and
    * the integer permille Jaccard, with set sizes carried from the
    * candidate stage instead of re-joined. Output is Ω(true pair mass)
    * by semantics — on the clone-heavy sf1 fixture that is the ~105k
    * intra-clone pairs. */
  def qSetsimJoin(s: SparkSession, d: String): DataFrame = {
    val maxDf = 10
    val sh = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 3)
      .distinct()
    val dfc = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val cs = sh.join(dfc, "shingle")
    val sz = cs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val pr = cs.join(sz, "doc_id")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= col("sz") - expr("(7 * sz + 9) div 10") + 1)
      .select("doc_id", "shingle", "rn", "sz")
    val cand = pr.as("a").join(pr.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          lit(10) * least(col("a.sz"), col("b.sz")) >=
            lit(7) * greatest(col("a.sz"), col("b.sz")))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).as("np"),
        max(col("a.rn")).as("pa"), max(col("b.rn")).as("pb"))
      .where(col("np") + least(col("sza") - col("pa"), col("szb") - col("pb")) >=
        expr("(7 * (sza + szb) + 16) div 17"))
      .select("id_a", "id_b", "sza", "szb")
    val inter = cand
      .join(cs.select(col("doc_id").as("id_a"), col("shingle")), "id_a")
      .join(cs.select(col("doc_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b", "sza", "szb").agg(count(lit(1)).as("i"))
    inter
      .withColumn("jac_permille", expr("(i * 1000) div (sza + szb - i)"))
      .where(col("jac_permille") >= 700)
      .select("id_a", "id_b", "jac_permille")
      .orderBy("id_a", "id_b")
  }

  /** MinHash-LSH dedup MAP ([[graft.operators.TextOps.lshDedupMap]]):
    * every doc → min doc id sharing a band (single-hop canonical
    * representative) — the linear, pair-free form a 100 TB dedup pass
    * materializes ([[qMinhashDedup]] keeps the pair-list form; the
    * connected-components fixpoint is `lshDedupClusters`, ScalaTest-
    * checked). Docs with no shingles (fewer than 3 tokens) are absent,
    * matching the signature aggregate. */
  def qMinhashDedupMap(s: SparkSession, d: String): DataFrame = {
    val sig = TextOps.minhashSignatureMd5(Tables.documents(s, d), "doc_id", "text", 3, 4)
    TextOps.lshDedupMap(sig, "doc_id", 4)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Exact n-gram (token-set) Jaccard similarity on a deterministic 2%
    * sample, blocked by language. The unsampled scale path uses MinHash-LSH
    * prefiltering ([[qMinhashDedup]]) before exact Jaccard. Posting lists
    * are df-capped at 1000: a token shared by more documents than that is a
    * stopword-frequency token that contributes ~0 to a 0.5-Jaccard ranking
    * but squares the pair expansion — it is dropped BEFORE the list is ever
    * collected, so a degenerate bucket can't materialize at 100 TB. */
  def qNgramJaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccard(Tables.documents(s, d).where(col("doc_id") % 50 === 0),
      dfCap = 1000)

  /** [[qNgramJaccard]] body with the document-frequency cap exposed for
    * testing. `df` per (lang, token) is aggregated FIRST and hot tokens
    * (df > dfCap) are filtered out before `collect_list`, so the quadratic
    * pair expansion is bounded by dfCap² per posting list and no oversized
    * array is ever built. All three (lang, token) shuffles hash-partition on
    * the same key, so the df join and the list aggregation reuse the token
    * exchange. Set sizes (`sz`) stay computed on the UNCAPPED token sets —
    * the cap only prunes intersection candidates, not the denominator. */
  private[graft] def ngramJaccard(docs: DataFrame, dfCap: Int): DataFrame = {
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(split(Ops.normalizeText(col("text")), " ")).as("token"))
      .where(col("token") =!= "").distinct()
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dft = tok.groupBy("lang", "token").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, dfCap))
    // Pair expansion inside each (lang, token) posting list — one token
    // pipeline + one shuffle; the equivalent self-join recomputes the
    // tokenization on both sides. Lists are bounded by dfCap.
    val inter = tok.join(dft.select("lang", "token"), Seq("lang", "token"))
      .groupBy("lang", "token")
      .agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"))
    inter
      .join(sz.select(col("doc_id").as("id_a"), col("sz").as("na")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("sz").as("nb")), "id_b")
      // threshold and output both in exact integers: the union size can
      // carry a factor of 5, putting c/union exactly on a 4-dp .5
      // boundary where double rounding is engine-specific
      .where(col("c") * 2 >= col("na") + col("nb") - col("c"))
      .withColumn("u", col("na") + col("nb") - col("c"))
      .select(col("id_a"), col("id_b"),
        (expr(roundDiv("c", "u", 10000L)).cast("double") / 10000.0).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Exact dedup on documents via fingerprint equality: every doc mapped to
    * its canonical representative (smallest doc_id sharing the normalized-
    * text md5) — the dedup MAP a 100 TB exact-dedup pass materializes.
    * One hash-partitioned window over the fingerprint (dup groups are tiny,
    * cardinality is high — fully parallel). `is_canonical` marks survivors. */
  def qExactDedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Whole-document fingerprint (portable md5 of normalized text). */
  def qDocFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Per-document quality metrics. */
  def qQualityScore(s: SparkSession, d: String): DataFrame =
    TextOps.qualityScore(Tables.documents(s, d), "doc_id", "text", STOPWORDS)
      .orderBy("doc_id")

  /** Composite Gopher-style quality gate: per-doc boolean verdicts from the
    * repetition signals ([[graft.operators.TrainPrep.repetitionStats]] —
    * one pass, two map-side-combinable aggregates), thresholded the way a
    * training-data filter stage composes them. Degenerate docs (no bigrams)
    * pass the bigram gate vacuously (null-safe coalesce). */
  def qQualityFilter(s: SparkSession, d: String): DataFrame =
    TrainPrep.repetitionStats(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"),
        col("n_tokens").between(20, 100000).as("length_ok"),
        (col("dup_word_frac") <= 0.6).as("repetition_ok"),
        coalesce(col("top_bigram_frac") <= 0.2, lit(true)).as("bigram_ok"))
      .withColumn("keep",
        col("length_ok") && col("repetition_ok") && col("bigram_ok"))
      .orderBy("doc_id")

  /** Corpus n-gram statistics: top-20 bigrams per language by count.
    * Bigrams are formed ROW-LOCALLY by the native `Shingles` expression
    * (never crossing documents, zero token shuffle); the count aggregate
    * combines map-side, so the per-lang ranking window only ever sees the
    * bounded distinct-bigram frame — the shape a corpus-statistics pass
    * keeps at 100 TB. */
  def qNgramCounts(s: SparkSession, d: String): DataFrame = {
    val sh = TextOps.explodedShingles(
      Tables.documents(s, d).select("lang", "text"), "lang", "text", 2)
    val counts = sh.groupBy(col("lang"), col("shingle").as("bigram"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 20)
      .orderBy("lang", "rk")
  }

  /** Session-lifetime memo of the deterministic k=8 seed centroids, keyed
    * by data dir: [[qKmeansStep]], [[qKnnJoinBlocked]] and [[qSemDedup]]
    * share one bounded k-row collect instead of re-seeding per query
    * (round-5 advice). The key is the input PATH — the standard
    * immutable-snapshot assumption of a warehouse batch; a racing
    * `getOrElseUpdate` may seed twice, harmlessly (same deterministic
    * result). */
  private val seedCentroidCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Int), Array[(Long, Array[Double])]]
  private def cachedSeedCentroids(s: SparkSession, d: String,
                                  k: Int): Array[(Long, Array[Double])] =
    seedCentroidCache.getOrElseUpdate((d, k),
      Similarity.seedCentroids(Tables.embeddings(s, d), "vec_id",
        "embedding", k))

  /** Cached embeddings row count per data dir — sizes [[qSemDedup]]'s
    * adaptive cluster count (same immutable-snapshot assumption and
    * bounded-driver-round-trip class as the seed-centroid cache above). */
  private val embCountCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private def cachedEmbCount(s: SparkSession, d: String): Long =
    embCountCache.getOrElseUpdate(d, Tables.embeddings(s, d).count())

  /** One Lloyd k-means iteration over the embeddings
    * ([[graft.operators.Similarity.kmeansStep]]): deterministic k=8 seed
    * centroids, exact argmin assignment, per-(cluster, dim) mean — output
    * is k·dim rows regardless of corpus size. The oracle re-ranks by
    * DuckDB's `list_distance` (monotone sqrt of the same double sum), so
    * the assignment matches exactly; the centroid is the order-free
    * µ-quantized integer sum reduced to EXACT 4-dp fixed point in pure
    * integer arithmetic on BOTH engines (sign-adjusted truncating
    * division — Spark `div` and DuckDB `//` both truncate toward zero).
    * No double is ever rounded: `round(double, 4)` is engine-specific at
    * boundary cells (BigDecimal vs multiply-round-divide) and cost two
    * rounds of hash mismatches. */
  def qKmeansStep(s: SparkSession, d: String): DataFrame =
    Similarity.kmeansStepPrecomputed(Tables.embeddings(s, d), "vec_id",
        "embedding", cachedSeedCentroids(s, d, 8))
      .orderBy("cluster_id", "pos")

  /** Int8 scalar quantization of every embedding
    * ([[graft.operators.Similarity.quantizeInt8]]): per-vector scale,
    * integer codes, max reconstruction error. Row-local, zero shuffle. */
  def qVectorQuantize(s: SparkSession, d: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
      .orderBy("vec_id")

  /** Exact k-nearest-neighbor JOIN ([[graft.operators.Similarity
    * .knnJoinExact]]): every 20th vector finds its 3 nearest corpus
    * neighbors by cosine. The query side is broadcast (narrow scoring
    * pass over the corpus scan); the only exchange carries the slim score
    * triples into the per-query ranking window. The 100 TB path swaps in
    * `knnJoinBlocked` (cluster-blocked candidates) — ScalaTest asserts its
    * recall against this exact form. */
  def qKnnJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    Similarity.knnJoinExact(e, "vec_id", "embedding", q, 3)
      .orderBy("q_id", "rk")
  }

  /** The cluster-blocked kNN join ([[graft.operators.Similarity
    * .knnJoinBlocked]]) as a DECLARED query: unlike the ANN probes this
    * approximation is fully deterministic (seeded centroids, exact argmin
    * assignment, rounded-sim ranking), so the whole blocked pipeline —
    * coarse assignment, candidate restriction, per-query rerank — has an
    * EXACT DuckDB oracle. Candidates drop from |Q|·|corpus| to |Q|·|bucket|;
    * at scale the cluster id is a partition key and the candidate scan is
    * metadata-pruned I/O. */
  def qKnnJoinBlocked(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    Similarity.knnJoinBlocked(e, "vec_id", "embedding", q, 3,
        cachedSeedCentroids(s, d, 8))
      .orderBy("q_id", "rk")
  }

  /** SemDeDup-style semantic near-dup pairs ([[graft.operators.Similarity
    * .semDedupPairs]]): k-means-assign every embedding to its nearest seed
    * centroid, compare pairs only WITHIN a cluster (equi-join on the
    * cluster id — n²/k compares, never a cross join), keep cosine ≥ 0.3.
    * The cluster count is the scale dial and is DECLARED adaptive:
    * k = max(8, n div 2500), so the expected cluster size — and with it
    * the per-cluster quadratic pair pass AND the join's parallelism (one
    * task per cluster id) — stays constant as the corpus grows, which is
    * the SemDeDup production posture (k ∝ n; the cluster id becomes a
    * materialized partition key and each cluster's pair pass is local
    * I/O). The rule is the identity (k = 8) at every oracle fixture up to
    * sf1 and is restated in the oracle's LIMIT, so a 100× check exercises
    * the adaptive path on both engines. The n lookup is one cached
    * driver-side count — same bounded round-trip class as the seed
    * collect it feeds. */
  def qSemDedup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val k = math.max(8L, cachedEmbCount(s, d) / 2500L).toInt
    Similarity.semDedupPairsPrecomputed(emb, "vec_id",
        "embedding", cachedSeedCentroids(s, d, k), threshold = 0.3)
      .orderBy("id_a", "id_b")
  }

  /** MinHash-estimated Jaccard for the LSH candidate pairs
    * ([[graft.operators.TextOps.minhashEstimatedJaccard]]): est = matching
    * md5 hash families / 4 — the signature-only triage a dedup pipeline
    * runs between banding and exact verification (no token re-scan). */
  def qMinhashEst(s: SparkSession, d: String): DataFrame = {
    val sig = TextOps.minhashSignatureMd5(Tables.documents(s, d),
      "doc_id", "text", 3, 4)
    TextOps.minhashEstimatedJaccard(sig, "doc_id", 4)
      .orderBy("id_a", "id_b")
  }

  /** BM25-style relevance top-10 ([[graft.operators.TextOps.bm25TopK]]):
    * integer-exact fixed-point BM25 (rational idf core, k1=1.2 b=0.75) for
    * a fixed 3-term query — one tokenize pass, one per-doc aggregate, one
    * broadcast stats row, TakeOrdered final. */
  def qBm25(s: SparkSession, d: String): DataFrame =
    TextOps.bm25TopK(Tables.documents(s, d), "doc_id", "text",
      Seq("vector", "stream", "hash"), 10)

  /** Substring-level duplication stats: per doc, the share of its distinct
    * 3-token shingles that also occur in another document — linear
    * (df-as-window) formulation, no pair expansion. */
  def qDupNgramSpans(s: SparkSession, d: String): DataFrame =
    TextOps.dupSpanStats(Tables.documents(s, d), "doc_id", "text", 3)
      .orderBy("doc_id")

  /** Exact-substring dedup at k=5 tokens ([[graft.operators.TextOps
    * .substringDedup]]): the train-prep operator that REMOVES verbatim
    * cross-document spans (the standard companion to MinHash in a
    * curation stack — near-dup clustering catches whole documents,
    * substring dedup catches the boilerplate/quotation mass inside
    * otherwise-unique ones). Per doc: exact token counts of the
    * duplicated-span union, the post-trim size, and the drop/trim/keep
    * decision. Linear end-to-end — shingle-df, never pairs. */
  def qSubstringDedup(s: SparkSession, d: String): DataFrame =
    TextOps.substringDedup(Tables.documents(s, d), "doc_id", "text", 5)
      .orderBy("doc_id")

  /** Strict ordered funnel view → click → purchase over the event log:
    * users reaching each stage, folded in ONE actor-keyed shuffle
    * ([[graft.operators.EventAnalytics.funnelStages]]). */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val st = EventAnalytics.funnelStages(Tables.events(s, d),
      "user_id", "ts", "event_type", "event_id", Seq("view", "click", "purchase"))
    st.agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
      .selectExpr("stack(3, 1L, 'view', n1, 2L, 'click', n2, 3L, 'purchase', n3) " +
        "AS (stage, stage_name, n_users)")
      .transform(ps(col("stage")))
  }

  /** Cohort retention grid: users cohorted by first-event week, counted in
    * every (cohort_week, week_offset) cell they are active in. */
  def qCohortRetention(s: SparkSession, d: String): DataFrame =
    EventAnalytics.cohortRetention(Tables.events(s, d), "user_id", "ts")
      .transform(ps(col("cohort_week"), col("week_offset")))

  /** Interval-overlap self-join: pairs of one customer's orders whose
    * 7-day fulfilment windows overlap — equi-join on the customer key with
    * the overlap test as residual (never a cartesian). */
  def qIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").as("w_start"),
      expr("o_orderdate + INTERVAL 7 DAYS").as("w_end"))
    Shuffles.intervalOverlapSelfJoin(o, "o_custkey", "o_orderkey", "w_start", "w_end")
      .select(col("k").as("o_custkey"), col("id_a").as("key_a"),
        col("id_b").as("key_b"),
        datediff(least(col("e_a"), col("e_b")), greatest(col("s_a"), col("s_b")))
          .cast("long").as("overlap_days"))
      .orderBy("o_custkey", "key_a", "key_b")
  }

  /** Deterministic weighted priority sample: 30 orders, inclusion odds
    * proportional to order value, fully reproducible from (key, weight)
    * ([[graft.operators.Ops.weightedSeededTopN]] — TakeOrderedAndProject). */
  def qWeightedSample(s: SparkSession, d: String): DataFrame =
    Ops.weightedSeededTopN(Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        "o_orderkey", expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"), 30)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("__h").as("h"), col("__w").as("w_cents"))
      .orderBy("o_orderkey")

  /** Percentile-gated quality filter (train-prep): keep documents whose
    * whitespace-token count reaches the 25th percentile WITHIN their
    * language (per-language thresholds, as corpus filters are tuned).
    * The gate is `percent_rank() >= 0.25` — percent_rank is the integer
    * rational `(rank-1)/(n-1)`, ONE IEEE division, so the kept set is
    * bit-reproducible across engines (no interpolated quantile threshold
    * to drift in the last ulp). The window is lang-partitioned — never a
    * single-task global sort. */
  def qPercentileGate(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      size(filter(split(Ops.normalizeText(col("text")), " "), t => t =!= ""))
        .cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n_tokens"), col("doc_id"))
    toks.withColumn("pr0", percent_rank().over(w))
      .where(col("pr0") >= 0.25)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("pr0"), 6).as("pr"))
      .orderBy("doc_id")
  }

  /** Per-cohort standardization: each event's value as a z-score against
    * its event-type cohort. The 5-row stats aggregate is broadcast back —
    * the fact table is scanned once and never shuffled. */
  def qZscore(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val stats = ev.groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("mu")) / nullif(col("sigma"), lit(0.0)), 4).as("z"))
      .orderBy("event_id")
  }

  /** Event-transition matrix (first-order Markov counts): for each ordered
    * per-user pair of consecutive events, the transition count and distinct
    * actors making it. One user-partitioned window + a bounded (5×5)
    * aggregate. */
  def qEventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"))
      .transform(ps(col("from_type"), col("to_type")))
  }

  /** Skyline / Pareto frontier per priority class: orders not dominated by
    * any strictly-later order with ≥ price, via a value-RANGE window (max
    * price over days > current) — sort + running max, NO pairwise
    * dominance join. Same-day peers are not compared (frontier over
    * distinct days). Days are integer (epoch-anchored) so the range frame
    * is engine-portable. */
  def qSkyline(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("days").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
          .cast("long").as("days"))
      .withColumn("best_later", max(col("o_totalprice")).over(w))
      .where(col("best_later").isNull || col("o_totalprice") > col("best_later"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("days"), col("o_totalprice"))
      .orderBy("o_orderpriority", "days", "o_orderkey")
  }

  /** Brute-force cosine top-k vs the vec_id=0 probe. Both engines compute
    * the dot/norms in double (the oracle casts FLOAT[] → DOUBLE[]), rank by
    * the 4-decimal-rounded similarity, and break ties by vec_id — so the
    * selected set is stable under the ~1e-15 summation-order drift and the
    * oracle hash-matches. Plans as TakeOrderedAndProject (per-partition
    * heaps, no global sort). */
  def qCosineTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probe = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val probeCol = array(probe.map(v => lit(v.toDouble)): _*)
    emb.where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        round(cosine_sim(col("embedding"), probeCol), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** ONE driver round-trip for the whole IVF index state: the probe vector
    * (vec_id = 0) and the `nlist` seeded centroids fetched as a union of
    * two tiny plans — one collect, one scheduling round, instead of two
    * (the per-query latency floor is jobs, not rows). The centroid hash
    * rank is carried as a column and re-sorted driver-side, reproducing
    * [[graft.operators.Similarity.seededCentroids]]'s order exactly. */
  private def probeAndCentroids(emb: DataFrame, nlist: Int,
                                seed: Long = 42L): (Array[Double], Array[Array[Double]]) = {
    val h = Similarity.seededRank(col("vec_id"), seed)
    val rows = emb.where(col("vec_id") === 0)
      .select(lit(-1L).as("h"), col("vec_id").as("id"), col("embedding"))
      .unionAll(emb.where(col("vec_id") =!= 0)
        .orderBy(h, col("vec_id"))
        .limit(nlist)
        .select(h.as("h"), col("vec_id").as("id"), col("embedding")))
      .collect()
    val probe = Similarity.toDoubleVec(rows.find(_.getLong(0) == -1L).get, 2)
    val centroids = rows.filter(_.getLong(0) >= 0L)
      .sortBy(r => (r.getLong(0), r.getLong(1)))
      .map(Similarity.toDoubleVec(_, 2))
    (probe, centroids)
  }

  /** IVF approximate nearest neighbor (rows-only: recall depends on nprobe,
    * so there is no exact SQL oracle; exhaustive-nprobe equivalence to brute
    * force is asserted in ScalaTest). */
  def qAnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val (probe, cents) = probeAndCentroids(emb, nlist = 16)
    // cap at the realized centroid count (a tiny table yields < nlist
    // centroids), mirroring ivfTopK's graceful degradation
    Similarity.ivfTopKPrecomputed(emb.where(col("vec_id") =!= 0), "vec_id",
        "embedding", cents, probe, 10,
        nprobe = math.min(4, cents.length).max(1))
      .select(col("vec_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
  }

  /** Signed-random-projection LSH approximate nearest neighbor — the
    * bucket-pruned scale path beside IVF: candidates = vectors whose 8-bit
    * hyperplane signature is within hamming 2 of the probe's, then exact
    * cosine rerank. Deterministic (seeded hyperplanes, total tie order) but
    * approximate in recall — rows-only like [[qAnnIvf]]; bucket-restricted
    * ⊆ brute-force equivalence is asserted in ScalaTest. */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probe = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    Similarity.cosineTopKLsh(emb.where(col("vec_id") =!= 0), "vec_id",
        "embedding", probe, 10, nBits = 8, hamming = 2)
      .select(col("vec_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
  }

  /** The LSH path under the oracle: with `hamming == nBits` every vector
    * passes the bucket filter (a Hamming distance over nBits bits can
    * never exceed nBits), so the candidate set is the full corpus and the
    * exact cosine rerank is EXACTLY brute-force top-k — the recall dial's
    * honest endpoint for signed-random-projection LSH, the same way
    * `nprobe == nlist` is for IVF. The seeded hyperplane buckets and the
    * bit_count filter still EXECUTE for every row (the oracle covers the
    * whole bucket→filter→rerank pipeline, not a shortcut around it);
    * [[qAnnLsh]] keeps the pruned hamming=2 operating point, rows-only. */
  def qAnnLshExact(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probe = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    Similarity.cosineTopKLsh(emb.where(col("vec_id") =!= 0), "vec_id",
        "embedding", probe, 10, nBits = 8, hamming = 8)
      .select(col("vec_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
  }

  /** The IVF path under the oracle: with `nprobe == nlist` every inverted
    * list is scanned, so the result is EXACTLY brute-force top-k — the
    * DuckDB cosine oracle verifies the whole assign→prune→rerank pipeline
    * end to end (the recall dial's honest endpoint; [[qAnnIvf]] keeps the
    * pruned operating point, rows-only). */
  def qAnnExhaustive(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val (probe, cents) = probeAndCentroids(emb, nlist = 16)
    Similarity.ivfTopKPrecomputed(emb.where(col("vec_id") =!= 0), "vec_id",
        "embedding", cents, probe, 10,
        nprobe = math.min(16, cents.length).max(1))
      .select(col("vec_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
  }

  /** L2 norms over the embedding column — the array-function tier
    * (`transform`/`aggregate` higher-order functions) with an exact oracle. */
  def qVectorNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(Similarity.l2norm(col("embedding")), 4).as("l2"),
        col("label"))
      .orderBy("vec_id")

  /** Exact embedding near-dup pairs on a deterministic 10% sample — the
    * oracle-able tier of vector dedup. The unsampled scale path is
    * [[graft.operators.Similarity.embeddingNearDupPairs]] (LSH-blocked,
    * equi-join on bucket — never a cross join); this declared query keeps
    * exact all-pairs semantics so DuckDB can verify every similarity. */
  def qEmbedNeardup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).where(col("vec_id") % 10 === 0)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine_sim(col("va"), col("vb")), 4).as("sim"))
      .where(col("sim") >= 0.3)
      .orderBy("id_a", "id_b")
  }

  /** SimHash-64 near-dup buckets: docs whose simhashes are ≤8 bits apart,
    * LSH-blocked on the top-16 bits, pairs expanded inside each block
    * (one signature computation, one shuffle — same shape as
    * [[graft.operators.TextOps.lshCandidatePairs]]). No oracle: xxhash64
    * is Spark-private. */
  def qSimhashDedup(s: SparkSession, d: String): DataFrame = {
    val sh = TextOps.simhash64(Tables.documents(s, d), "doc_id", "text")
    sh.groupBy(shiftright(col("simhash"), 48).as("blk"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("docs"))
      .where(size(col("docs")) > 1)
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        TextOps.hammingDist(col("a.simhash"), col("b.simhash")).as("hamming"))
      .where(col("hamming") <= 8)
      .orderBy("id_a", "id_b")
  }

  /** Pivot: quantities by return flag × line status as columns. Pivot
    * values are declared explicitly — at scale, never let pivot() run its
    * value-discovery pre-query over the full input. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .transform(ps(col("l_returnflag")))

  /** Equi + range join: lineitems shipped within 30 days of their order's
    * date. The equi key makes this a plain co-partitioned join with the
    * range as a residual filter — the shape Catalyst handles natively
    * (keyless ranges use [[graft.operators.Ops.binnedRangeJoin]]). */
  def qRangeJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .orderBy("o_orderkey")

  /** Typed JSON parsing via from_json (vs [[qJsonExtract]]'s path
    * extraction): parse `props` into a struct and project the typed field. */
  def qJsonStruct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
      .orderBy("event_id")

  /** Numeric RANGE window frame: per user, sum of `value` over events whose
    * event_id lies within 5 of the current one. */
  def qWindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rangeBetween(-5, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 2).as("recent_sum"))
      .orderBy("user_id", "event_id")
  }

  /** Trending leaderboard: per day, the top-3 event types by TRAILING
    * 7-day volume — the sliding-window rank behind every "trending now"
    * surface. The daily grid is one map-side-combinable aggregate
    * (calendar × |types| rows at ANY event volume — the only pass over
    * the fact); the trailing sum is a type-keyed RANGE frame over the
    * integer day key (gap-correct: absent days simply contribute
    * nothing), and the leaderboard rank is day-keyed over the bounded
    * type set. Nothing after the first aggregate touches O(events)
    * rows. */
  def qTrending(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dkey",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val wroll = Window.partitionBy(col("event_type")).orderBy(col("dkey"))
      .rangeBetween(-6, 0)
    val wrank = Window.partitionBy(col("day"))
      .orderBy(col("n7").desc, col("event_type"))
    daily.withColumn("n7", sum(col("n")).over(wroll))
      .withColumn("rnk", row_number().over(wrank).cast("long"))
      .where(col("rnk") <= 3)
      .select(col("day"), col("rnk"), col("event_type"), col("n7"))
      .orderBy("day", "rnk")
  }

  /** lag(): exact µs gap between consecutive events per user (µs integer
    * arithmetic on both engines — no float, no truncation drift). */
  def qWindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** INTERSECT: customers having both a fulfilled ('F') and an open ('O')
    * order. */
  def qSetIntersect(s: SparkSession, d: String): DataFrame = {
    val f = Tables.orders(s, d).where(col("o_orderstatus") === "F").select("o_custkey")
    val o = Tables.orders(s, d).where(col("o_orderstatus") === "O").select("o_custkey")
    f.intersect(o).orderBy("o_custkey")
  }

  /** Calendar aggregation: revenue per month via date_trunc. */
  def qMonthlyRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n"))
      .transform(ps(col("month")))

  /** Zero-padded object naming (the reference's `batch_%06d.json`,
    * create_artist_batches.py:34). */
  def qBatchFormat(s: SparkSession, d: String): DataFrame =
    Ops.batchAssignScalable(Tables.customer(s, d).select("c_custkey"), "c_custkey", 500)
      .select(col("c_custkey"),
        format_string("batch_%06d.json", col("batch_id")).as("object_name"))
      .orderBy("c_custkey")

  /** Full CUBE: every grouping-set combination of (flag, status) in one
    * pass. */
  def qCube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n"))
      .transform(ps(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** Hierarchical aggregation via ROLLUP: per (flag, status), per flag, and
    * grand total in one pass (partial-aggregated like any groupBy). */
  def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .transform(ps(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** Token counting: whitespace tokens + a BPE-ish pre-tokenizer regex
    * (letter runs / digit runs / single punctuation) — both expressible in
    * the oracle's regex dialect. */
  def qTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(filter(split(Ops.normalizeText(col("text")), " "), t => t =!= ""))
        .cast("long").as("ws_tokens"),
      TextOps.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
      .orderBy("doc_id")

  /** Left-anti join: customers with no high-value (>400k) order — the
    * complement of the S18 semi-join shape. The filter is applied to the
    * right side BEFORE the join, so the anti probe is against the small
    * filtered set. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_totalprice") > 400000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Explicit GROUPING SETS — per-flag and per-status marginals in one pass
    * (the cube/rollup generalization; partial-aggregates like any groupBy). */
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .transform(ps(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** Skew-salted fact⋈dim join ([[graft.operators.Shuffles.saltedJoin]]):
    * events fan in on 150 distinct user_ids, the canonical hot-key shape.
    * The salt spreads each key over 8 subkeys; the oracle is the PLAIN join
    * — proving the salted plan is semantics-preserving end to end. */
  def qSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id").as("k"), col("value"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    Shuffles.saltedJoin(ev, cust, "k", salts = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .transform(ps(col("c_mktsegment")))
  }

  /** Sliding 6-hour windows advancing every 3 hours via the streaming-
    * compatible `window()` operator over static events — each event lands
    * in exactly 6h/3h = 2 overlapping windows (the oracle restates the
    * epoch-aligned membership as a 2-row generator cross join). */
  def qSlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_micros(col("w.start")).as("window_start_us"), col("n"), col("total"))
      .orderBy("window_start_us")

  /** Bloom-runtime-filtered semi-join ([[graft.operators.Shuffles.bloomSemiJoin]]):
    * lineitems of high-value orders, with the fact side pre-filtered by a
    * bloom sketch of the qualifying order keys INSIDE the scan stage — only
    * ~|matches| rows reach the shuffle. The oracle is the PLAIN semi-join:
    * bloom false positives are dropped by the exact join, so the filter is
    * proven semantics-preserving end to end. */
  def qBloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    val highValue = Tables.orders(s, d)
      .where(col("o_totalprice") > 300000).select("o_orderkey")
    Shuffles.bloomSemiJoin(Tables.lineitem(s, d), highValue,
        "l_orderkey", "o_orderkey", expectedItems = 100000L)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      // full-column sort: (l_orderkey, l_linenumber) is not unique in the
      // fixture, so the price column must participate for a total order
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  /** Session windows in BATCH: events within 24 h of the previous event
    * merge into one session per user (`session_window` — the same operator
    * Structured Streaming uses, here over the static table). Output keyed
    * by the session's first-event time in µs (integer — no timestamp
    * precision drift against the oracle). */
  def qSessionize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "24 hours"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n"), col("total"))
      .orderBy("user_id", "session_start_us")

  /** CLOSED sessions at a 30-minute gap — the batch statement of the
    * streaming contract ([[graft.streaming.EventStreams
    * .closedSessionsBatch]]): lag/gap sessionization minus each user's
    * trailing still-open session, i.e. exactly the set the
    * `flatMapGroupsWithState` emitter has produced after an AvailableNow
    * replay of the same log (StreamingSpec asserts that equality; this
    * row puts the same semantics on the oracle board). All windows
    * user-keyed; output one row per closed session in epoch micros. */
  def qClosedSessions(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.closedSessionsBatch(Tables.events(s, d), 30)
      .orderBy("user_id", "start_us")

  /** Language-ID heuristic (script detection + stopword voting) — the
    * semantics stay fully declarative so the oracle restates them in SQL;
    * the execution is the native zero-shuffle single-sweep expression
    * ([[graft.operators.TextOps.langIdNative]] / StopwordVotes — the
    * explode+aggregate form is the cross-checked reference). */
  def qLangId(s: SparkSession, d: String): DataFrame =
    TextOps.langIdNative(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** As-of join: each event picks the customer's latest order at or before
    * the event time (greatest (o_orderdate, o_orderkey)). Runs the scalable
    * union+carry-forward operator ([[graft.operators.AsOfJoin]]) — one
    * shuffle of |L|+|R|; the oracle states the same semantics naively. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
    val ord = Tables.orders(s, d).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    graft.operators.AsOfJoin.asOf(ev, ord, "user_id", "ts", "o_orderdate",
        "o_orderkey")
      .select("event_id", "user_id", "o_orderkey")
      .orderBy("event_id")
  }

  /** Nearest as-of join: each event picks the customer's order closest in
    * time on either side (backward preferred on exact ties), with the
    * winning |distance| in µs. One |L|+|R| shuffle computes both
    * directional carries over a single window sort
    * ([[graft.operators.AsOfJoin.asOfNearest]]); the oracle restates the
    * semantics as the naive pair ranking, which the operator must match
    * without ever materializing the pairs. */
  def qAsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
    val ord = Tables.orders(s, d).select(
      col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    graft.operators.AsOfJoin.asOfNearest(ev, ord, "user_id", "ts",
        "o_orderdate", "o_orderkey")
      .select("event_id", "user_id", "o_orderkey", "dist_us")
      .orderBy("event_id")
  }

  /** Exact interpolated percentiles + median per group (≡ DuckDB
    * `quantile_cont` on the integer-unit inputs), via
    * [[graft.operators.Ops.exactPercentileBounds]] — distributed
    * two-round selection + EXACT integer interpolation. Spark's built-in
    * exact `percentile` aggregate buffers a whole group in one task
    * (measured 7× slower at sf0.1, and an OOM at 100 TB); the sort-based
    * form spills and parallelizes.
    *
    * Determinism: inputs are integer units (price cents, whole qty), and
    * since every requested p has p·20 integer (5/10/18), the interpolated
    * value is EXACTLY `(lo·20 + (hi−lo)·((n−1)·p·20 mod 20)) / 20` —
    * computed in long arithmetic and divided once at the end, identical
    * in any engine. The previous `round(lo + frac·(hi−lo), 2)` flipped a
    * cent at sf0.001 where the p50 midpoint landed on a .xx5 boundary
    * (Spark BigDecimal-HALF_UP vs DuckDB multiply-round). */
  def qPercentiles(s: SparkSession, d: String): DataFrame = {
    // melt both metrics into one (group, metric) pass — one ranking
    // pipeline (and one pair of tiny stats/offset jobs) instead of two
    val melted = Tables.lineitem(s, d).select(col("l_returnflag"),
      expr("stack(2, 'price', CAST(round(l_extendedprice * 100, 0) AS DOUBLE), " +
        "'qty', CAST(round(l_quantity, 0) AS DOUBLE)) AS (metric, v)"))
    val b = Ops.exactPercentileBounds(melted, Seq("l_returnflag", "metric"), "v",
      Seq(("p25", 0.25), ("p50", 0.5), ("p90", 0.9)))
    def c20(name: String, p20: Int) =
      col(s"${name}_lo").cast("long") * 20 +
        (col(s"${name}_hi").cast("long") - col(s"${name}_lo").cast("long")) *
          expr(s"((n - 1) * $p20) % 20")
    val pct = b.select(col("l_returnflag"), col("metric"),
      c20("p25", 5).as("p25_20"), c20("p50", 10).as("p50_20"),
      c20("p90", 18).as("p90_20"))
    pct.groupBy("l_returnflag").agg(
        (max(when(col("metric") === "price", col("p25_20"))).cast("double") / 2000.0).as("p25"),
        (max(when(col("metric") === "price", col("p50_20"))).cast("double") / 2000.0).as("p50"),
        (max(when(col("metric") === "price", col("p90_20"))).cast("double") / 2000.0).as("p90"),
        (max(when(col("metric") === "qty", col("p50_20"))).cast("double") / 20.0).as("med_qty"))
      .transform(ps(col("l_returnflag")))
  }

  /** Deterministic arg-max via struct-ordered max: per segment, the
    * highest-balance customer, ties broken by custkey — one partial-agg
    * pass, no window. (`max_by` alone has nondeterministic ties; the
    * struct's lexicographic order makes the winner total.) */
  def qArgmax(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(max(struct(col("c_acctbal"), col("c_custkey"), col("c_name"))).as("top"))
      .select(col("c_mktsegment"), col("top.c_acctbal").as("top_acctbal"),
        col("top.c_custkey").as("top_custkey"), col("top.c_name").as("top_name"))
      .transform(ps(col("c_mktsegment")))

  /** Conditional aggregation (FILTER-clause semantics): count_if /
    * filtered sum / filtered distinct-count in one grouped pass. */
  def qConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count_if(col("l_quantity") > 25).as("hi_qty_n"),
        round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 2).as("disc_rev"),
        countDistinct(when(col("l_quantity") < 5, col("l_partkey"))).as("lo_qty_parts"))
      .transform(ps(col("l_returnflag")))

  /** Statistical aggregates: sample stddev/variance, correlation,
    * covariance — all partial-mergeable (Welford-style) so they scale like
    * any groupBy; rounded because merge order perturbs low-order bits. */
  def qStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"))
      .transform(ps(col("l_returnflag")))

  /** Ordered set aggregation to a canonical string: per user, the sorted
    * distinct event types. `sort_array(collect_set(...))` keeps the result
    * deterministic regardless of partition order. */
  def qStringAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  /** Map-typed JSON: parse `props` into map<string,int>, project the sorted
    * key list (canonical string form) and a typed value lookup. */
  def qMapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("props").isNotNull)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(col("event_id"),
        concat_ws(",", sort_array(map_keys(col("m")))).as("keys"),
        col("m").getItem("k").as("k"))
      .orderBy("event_id")

  /** Variable-precision date parsing — the reference's `release_date` can
    * be YYYY, YYYY-MM, or YYYY-MM-DD (spotify_etl_v2.py:165). Re-created
    * here by formatting o_orderdate at 3 precisions, then parsed by
    * normalize-then-parse-ONCE: pad the missing "-01"/"-01-01" suffix by
    * length and run a single strict `try_to_date` — one formatter pass per
    * row instead of a 3-deep `coalesce(try_to_date...)` fallback chain
    * (measured 2× the parse cost; results identical — a malformed string
    * fails the strict full pattern either way). The oracle states the
    * same semantics with DuckDB's strict `try_strptime` chain. */
  def qDateParse(s: SparkSession, d: String): DataFrame = {
    val raw = when(pmod(col("o_orderkey"), lit(3)) === 0, date_format(col("o_orderdate"), "yyyy"))
      .when(pmod(col("o_orderkey"), lit(3)) === 1, date_format(col("o_orderdate"), "yyyy-MM"))
      .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), raw.as("release_date"))
      .withColumn("parsed", Ops.parsePartialDate(col("release_date")))
      .orderBy("o_orderkey")
  }

  /** Scalar subquery through the SQL surface: customers above the global
    * average balance (subquery plans as a one-row broadcast). */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql("""SELECT c_custkey, c_name, c_acctbal FROM customer
             WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
             ORDER BY c_custkey""")
  }

  /** Correlated EXISTS through the SQL surface (Catalyst rewrites it to the
    * same left-semi join as [[qSemiJoin]] — asserted in PlanSpec). */
  def qExistsSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql("""SELECT c_custkey, c_name FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
             ORDER BY c_custkey""")
  }

  /** ntile quartile assignment per segment (deterministic: the window order
    * is total). */
  def qNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("c_custkey")
  }

  /** first_value/last_value over an unbounded frame: each event annotated
    * with its user's first and last `value`. Doubles pass through untouched
    * (bit-identical from the shared parquet — no rounding needed). */
  def qFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        first(col("value")).over(w).as("first_val"),
        last(col("value")).over(w).as("last_val"))
      .orderBy("user_id", "event_id")
  }

  /** Calendar densification (gap filling): a generated month spine LEFT
    * JOINed against monthly revenue, missing months zero-filled — the
    * standard reporting shape `sequence()` + join expresses declaratively
    * (the spine is a LocalRelation-sized generator, never data-derived
    * state). Output is calendar-bounded, so presentation-sorted. */
  def qDateSeries(s: SparkSession, d: String): DataFrame = {
    val months = s.range(1).select(explode(sequence(
      lit("1995-01-01").cast("date"), lit("2001-08-01").cast("date"),
      expr("INTERVAL 1 MONTH"))).as("month"))
    val rev = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n"))
    months.join(rev, Seq("month"), "left")
      .select(col("month"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        coalesce(col("n"), lit(0L)).as("n"))
      .transform(ps(col("month")))
  }

  /** String-function tier sampler (every function portable to the oracle
    * dialect): case mapping, padding, reversal, substring replacement,
    * repetition, and edit distance against a fixed probe term. */
  def qStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lpad(col("p_brand"), 12, "#").as("padded"),
        reverse(col("p_type")).as("rev"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        repeat(col("p_brand"), 2).as("doubled"),
        levenshtein(col("p_type"), lit("ECONOMY")).cast("long").as("edit_dist"))
      .orderBy("p_partkey")

  /** MERGE-INTO upsert ([[graft.operators.Ops.mergeUpsert]]): a batch of
    * updates (balance bump, segment retag) and inserts (re-keyed copies)
    * applied to the customer dimension — matched keys take the update,
    * new keys insert, the rest pass through. The oracle restates the
    * union + first-wins window directly. */
  def qMergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
    val updates = base.where(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") + 1000, 2).as("c_acctbal"),
        lit("UPDATED").as("c_mktsegment"))
      // inserts are re-keyed STRICTLY negative (-(k+1), so -0 cannot alias
      // key 0) — they can never collide with a real key at any scale factor
      .unionByName(base.where(col("c_custkey") % 13 === 0)
        .select((-col("c_custkey") - 1).as("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), lit("INSERTED").as("c_mktsegment")))
    Ops.mergeUpsert(base, updates, Seq("c_custkey")).orderBy("c_custkey")
  }

  /** CDC changelog apply ([[graft.operators.Ops.applyChangelog]]): events
    * as a keyed change stream — per user the latest record wins, and a
    * latest 'error' record deletes the key. The surviving state table is
    * keyed by user with the last value and time. */
  def qCdcApply(s: SparkSession, d: String): DataFrame =
    Ops.applyChangelog(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("value"),
            unix_micros(col("ts")).as("ts_us"), col("event_id")),
        Seq("user_id"), "event_type", "error",
        Seq(col("ts_us"), col("event_id")))
      .select(col("user_id"), col("event_type"), col("value"), col("ts_us"))
      .orderBy("user_id")

  /** Wide→long melt via the native `unpivot` operator (the inverse of
    * [[qPivot]]): the three lineitem measures stacked into (metric, v)
    * rows, then aggregated per (flag, metric). Unpivot is a row-local
    * generator — no shuffle beyond the final groupBy. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .unpivot(Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "v")
      .groupBy("l_returnflag", "metric")
      .agg(round(sum(col("v")), 2).as("total"), count(lit(1)).as("n"))
      .transform(ps(col("l_returnflag"), col("metric")))

  /** Lateral explode with empty-array preservation: each document's long
    * (≥8-char) tokens, one row per token, and documents with NO long token
    * kept as a single null-token row (`explode_outer` — the LEFT JOIN
    * LATERAL shape; plain `explode` would silently drop them). */
  def qExplodeOuter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode_outer(filter(split(Ops.normalizeText(col("text")), " "),
          t => length(t) >= 8)).as("token"))
      .orderBy(col("doc_id"), col("token").asc_nulls_first)

  /** Regex capture-group extraction (the reference's string-wrangling tier
    * generalized): first word of the part name, trailing word of the type,
    * numeric suffix of the brand. Spark and the oracle both return '' on
    * no-match. */
  def qRegexpExtract(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "(\\w+)$", 1).as("last_type_word"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"))
      .orderBy("p_partkey")

  /** Array algebra over collected sets: per user, the sorted distinct
    * event-type array intersected / unioned / subtracted against a fixed
    * reference set. Arrays canonicalized (sorted, comma-joined) so the
    * result is order-insensitive and portable. */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame = {
    val ref = array(lit("purchase"), lit("signup"), lit("error"))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
      .select(col("user_id"),
        concat_ws(",", col("types")).as("types"),
        // types is sorted-distinct, so intersect/except (which preserve
        // left order) are already canonical
        concat_ws(",", array_intersect(col("types"), ref)).as("overlap"),
        concat_ws(",", sort_array(array_union(col("types"), ref))).as("combined"),
        concat_ws(",", array_except(col("types"), ref)).as("extra"),
        size(col("types")).cast("long").as("n_types"))
      .orderBy("user_id")
  }

  /** Calendar arithmetic: due date (+90 days), days since an epoch date,
    * end-of-month, ISO weekday, quarter — the date-function tier beyond
    * parsing ([[qDateParse]]) and truncation ([[qMonthlyRevenue]]). */
  def qDateArith(s: SparkSession, d: String): DataFrame = {
    val od = col("o_orderdate").cast("date")
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_add(od, 90).as("due_date"),
        datediff(od, lit("1992-01-01").cast("date")).cast("long").as("days_since"),
        last_day(od).as("month_end"),
        (weekday(od) + 1).cast("long").as("isodow"),
        quarter(od).cast("long").as("qtr"))
      .orderBy("o_orderkey")
  }

  /** Fixed-width histogram via explicit integer bucketing — pure arithmetic
    * (no engine-specific width_bucket), so the binning is bit-identical
    * everywhere and aggregates map-side like any groupBy. */
  def qHistogram(s: SparkSession, d: String): DataFrame = {
    val bucket = floor(col("o_totalprice") / 50000).cast("long")
    Tables.orders(s, d)
      .select(bucket.as("bucket"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("pc"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("pc")).as("spc"))
      // exact round-half-up mean in cents (roundDiv) — avg(double) lands
      // on engine-divergent .xx5 boundaries when n carries a factor of 5
      .withColumn("avg_price",
        expr(roundDiv("spc", "n", 1L)).cast("double") / 100.0)
      .withColumn("range",
        format_string("[%d,%d)", col("bucket") * 50000, (col("bucket") + 1) * 50000))
      .select("bucket", "range", "n", "avg_price")
      .transform(ps(col("bucket")))
  }

  /** FULL OUTER join on deliberately disjoint key ranges: orders-per-day
    * (1995-2001) against events-per-day (2024) — every row has one null
    * side, exercising both unmatched directions at once. */
  def qFullOuter(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("orders_n"))
    val e = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("events_n"))
    o.join(e, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("orders_n"), lit(0L)).as("orders_n"),
        coalesce(col("events_n"), lit(0L)).as("events_n"))
      .transform(ps(col("day")))
  }

  /** Relative-rank window functions: percent_rank and cume_dist over a
    * TOTAL order (acctbal, custkey) — ties impossible, so both engines
    * produce identical ranks; rounded against division drift. */
  def qPercentRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_custkey")
  }

  /** Stratified deterministic sampling: exactly 5 customers per market
    * segment, chosen by seeded Knuth-hash order within each stratum — the
    * per-group generalization of [[qSeededSample]]. One window pass; no
    * rand(), so reruns and retries return the same sample. */
  def qStratifiedSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(Ops.seededHash(col("c_custkey"), 0L), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        row_number().over(w).cast("long").as("rn"))
      .where(col("rn") <= 5)
      .orderBy("c_mktsegment", "rn")
  }

  /** SCD-2 effective-dated dimension build: each customer's order history
    * becomes versioned rows with [valid_from, valid_to) ranges via lead()
    * — valid_to = next version's start, null (open-ended) for the current
    * row. The standard warehouse dimension-maintenance shape. */
  def qScd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("valid_from"),
        lead(col("o_orderdate").cast("date"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  /** Multimodal-column plumbing with an exact oracle: the text payload
    * treated as an opaque BINARY column — byte length (≠ char length for
    * non-ASCII), md5 digest of the raw bytes, and a hex "magic number"
    * sniff of the leading bytes (the first 4 characters' UTF-8 encoding,
    * so both engines slice at a char boundary). The real decode/feature
    * paths over such columns live in [[graft.operators.Multimodal]]. */
  def qBinaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        length(col("text")).cast("long").as("char_len"),
        md5(col("text").cast("binary")).as("digest"),
        lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("magic"))
      .orderBy("doc_id")

  /** Schema-evolution append: two entity versions unioned BY NAME with a
    * missing column null-filled (`allowMissingColumns` — positional UNION
    * would silently mis-align). The supplier side models a v1 schema
    * without the balance column. */
  def qUnionByName(s: SparkSession, d: String): DataFrame = {
    val v2 = Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), lit("customer").as("src"))
    val v1 = Tables.supplier(s, d)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"),
        lit("supplier").as("src"))
    v2.unionByName(v1, allowMissingColumns = true).orderBy("src", "id")
  }

  /** Tumbling 6-hour windows via the streaming-compatible `window()`
    * operator over the static events table (epoch-aligned buckets — the
    * oracle restates the alignment in integer µs arithmetic). */
  def qTumblingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start_us", "event_type")

  // --------------------------------------- training-data prep tier (r4)

  /** Benchmark decontamination ([[graft.operators.TrainPrep.contaminationFlags]]):
    * docs outside source `src0` that share an 8-token shingle with the
    * `src0` "benchmark" split — the n-gram-overlap contamination check run
    * before training. Benchmark digests broadcast; corpus never shuffled
    * before the per-doc count. */
  def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    TrainPrep.contaminationFlags(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", 8)
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signals: duplicate-word fraction and
    * top-bigram fraction per document. */
  def qRepetitionScore(s: SparkSession, d: String): DataFrame =
    TrainPrep.repetitionStats(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** Top-3 tokens per doc by integer-arithmetic TF-IDF (exact, portable:
    * (tf·10⁹) div df — no log/float in the ranking key; the corpus size N
    * is dropped as a rank-preserving global constant). */
  def qTfidf(s: SparkSession, d: String): DataFrame =
    TrainPrep.tfIdfTopK(Tables.documents(s, d), "doc_id", "text", 3)
      .orderBy("doc_id", "rk")

  /** Tokenizer vocabulary: top-100 tokens with dense ids in
    * (count desc, token) order. */
  def qVocabBuild(s: SparkSession, d: String): DataFrame =
    TrainPrep.buildVocab(Tables.documents(s, d), "doc_id", "text", 100)
      .orderBy("vocab_id")

  /** Deterministic weighted dataset mixture: per-source keep rates in
    * permille decided by the portable Knuth hash of doc_id (seed 7) —
    * src0 kept whole, src1/src2 at 50%, everything else at 20%. */
  def qDatasetMixture(s: SparkSession, d: String): DataFrame =
    TrainPrep.mixtureSample(Tables.documents(s, d), "source", "doc_id",
        Map("src0" -> 1000, "src1" -> 500, "src2" -> 500),
        defaultPermille = 200, seed = 7L)
      .select("doc_id", "source", "lang")
      .orderBy("doc_id")

  /** Sequence packing: concat-then-chunk into 256-token context windows
    * via the scalable global prefix sum (bucket offsets + bucket-local
    * windows — no single-partition window). */
  def qPackSequences(s: SparkSession, d: String): DataFrame = {
    val counted = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(Ops.normalizeText(col("text")), " ")).cast("long").as("n_tokens"))
    TrainPrep.packSequences(counted, "doc_id", "n_tokens", 256)
      .orderBy("doc_id")
  }

  // --------------------------------------- training-data prep tier (r5)

  /** Context-window chunking for long-document splitting: each document's
    * token sequence cut into overlapping windows of 8 tokens at stride 4
    * (the train-time "chunk long docs into context windows" step, scaled
    * down for the fixture). Entirely ROW-LOCAL — the token array never
    * leaves its row (`sequence` + `explode` + `slice`), so the plan has no
    * join and no aggregate: at 100 TB this is a pure map stage that scales
    * linearly with input splits. Chunk content is carried as a portable md5
    * so the output stays narrow regardless of window size. */
  def qChunkWindows(s: SparkSession, d: String): DataFrame = {
    val win = 8L
    val stride = 4L
    Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(Ops.normalizeText(col("text")), " "), t => t =!= "").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n") - 1, lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start"),
        least(lit(win), col("n") - col("start")).as("n_tok"),
        md5(array_join(slice(col("toks"), (col("start") + 1).cast("int"), lit(win.toInt)), " "))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic train/val/test split + balanced class weights: the split
    * is decided per-document by the portable Knuth multiplicative hash of
    * doc_id (8/1/1 via bucket = h mod 10 — reproducible across engines and
    * re-runs, the property a training split needs), then per-(split, lang)
    * doc/char counts and the inverse-frequency class weight
    * `(split_docs · 10⁶) div (n_langs · n_docs)` (integer-exact, the weight
    * you'd feed a balanced sampler). One map-side-combinable aggregate over
    * the corpus; the weight window runs over the ≤ |splits|·|langs| grouped
    * rows, never the raw docs. */
  def qTrainSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = expr("((doc_id % 2147483648) * 2654435761) % 4294967296 % 10")
    val w = Window.partitionBy(col("split"))
    Tables.documents(s, d)
      .select(
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
          .as("split"),
        col("lang"), col("n_chars"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("split_docs", sum(col("n_docs")).over(w))
      .withColumn("n_langs", count(lit(1)).over(w))
      .select(col("split"), col("lang"), col("n_docs"), col("n_chars"),
        expr("(split_docs * 1000000) div (n_langs * n_docs)").as("weight_ppm"))
      .transform(ps(col("split"), col("lang")))
  }

  /** LEAKAGE-SAFE train/val/test split — the dedup-aware companion to
    * [[qTrainSplit]], which hashes each doc independently and therefore
    * lets near-duplicate pairs straddle splits (the classic eval
    * contamination bug: the model "generalizes" to a paraphrase of its own
    * training data). Here the split key is the doc's NEAR-DUP CLUSTER
    * canonical, so every member of an LSH cluster inherits the same split
    * by construction. The cluster map is the min-label-propagation
    * FIXPOINT over the band-bucket graph ([[graft.operators.TextOps
    * .lshDedupClustersTrace]]: bucket hop + pointer jump per round,
    * checkpoint-truncated, convergence observe-fused) under the declared
    * cap [[LeakageSplitCap]] — the cap makes the loop SQL-restatable as
    * materialized CTE rounds (idempotent after the fixpoint, exactly the
    * [[qKcore]] discipline) while Spark still stops early; the spec pins
    * rounds-executed < cap. Split = the same Knuth multiplicative hash as
    * qTrainSplit applied to the CANONICAL id (8/1/1). Docs with < 3
    * tokens have no shingles and are absent, as in the dedup map. */
  def qLeakageSplit(s: SparkSession, d: String): DataFrame =
    leakageSplitTrace(s, d)._1

  private[graft] val LeakageSplitCap = 16

  private[graft] def leakageSplitTrace(s: SparkSession, d: String): (DataFrame, Int) = {
    val sig = TextOps.minhashSignatureMd5(
      Tables.documents(s, d), "doc_id", "text", 3, 4)
    val (labels, rounds) =
      TextOps.lshDedupClustersTrace(sig, "doc_id", 4, LeakageSplitCap)
    val bucket =
      expr("((canonical_id % 2147483648) * 2654435761) % 4294967296 % 10")
    val out = labels
      .select(col("id").as("doc_id"), col("canonical_id"),
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
          .as("split"))
      .orderBy("doc_id")
    (out, rounds)
  }

  /** Unigram-LM rarity score (surprisal proxy without the log): each doc's
    * mean inverse token probability `avg_t (T·10⁶) div c_t` over the corpus
    * unigram counts — rare-token-heavy docs score high, boilerplate scores
    * low, and the ranking needs no float transcendentals (integer-exact,
    * hash-reproducible). The unigram table is vocabulary-sized (bounded,
    * broadcastable at any corpus scale); the corpus total rides along as a
    * broadcast 1-row cross join, so the token stream is shuffled once for
    * the per-doc tf aggregate and never again. HEADROOM: the rarity value
    * `(T·10⁶) div c_t` itself scales with corpus size — exact to
    * T ≤ 9.2·10¹² tokens (≈ 35 TB of text); past that drop the scale to
    * 10³ (same query shape, smaller constant). */
  def qRarityScore(s: SparkSession, d: String): DataFrame = {
    val tf = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
      .groupBy(col("doc_id"), col("shingle").as("token"))
      .agg(count(lit(1)).as("tf"))
    val uni = tf.groupBy("token").agg(sum(col("tf")).as("ct"))
    val tot = uni.agg(sum(col("ct")).as("t_tot"))
    tf.join(broadcast(uni), Seq("token"))
      .crossJoin(broadcast(tot))
      .withColumn("rar", expr("(t_tot * 1000000) div ct"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        expr("sum(tf * rar) div sum(tf)").as("rarity_ppm"))
      .orderBy("doc_id")
  }

  /** Collocation mining: top-20 corpus bigrams by a rank-preserving
    * integer PMI surrogate `(c_xy · T · 10⁵) div (c_x · c_y)` (PMI's
    * argument without the log — monotone in PMI for the shared corpus
    * total, so the ranking is exact and float-free), at min support
    * c_xy ≥ 5. Bigram and unigram counts are both map-side-combinable;
    * the vocabulary-sized unigram table is broadcast to the bigram side
    * twice (left and right token), so nothing large ever shuffles twice.
    * Final top-k plans as TakeOrderedAndProject. HEADROOM: the
    * `c_xy·T·10⁵` numerator is exact to c_xy·T ≤ 9.2·10¹³ — ample for the
    * declared scales; for a 100 TB corpus reorder to
    * `((c_xy·10⁵) div c_x)·T div c_y` (same engines-identical floor
    * arithmetic, unconditionally overflow-free). */
  def qPmiTopk(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val uni = TextOps.explodedShingles(docs, "doc_id", "text", 1)
      .groupBy(col("shingle").as("token")).agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).as("t_tot"))
    TextOps.explodedShingles(docs, "doc_id", "text", 2)
      .groupBy(col("shingle").as("bigram")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= 5)
      .withColumn("x", substring_index(col("bigram"), " ", 1))
      .withColumn("y", substring_index(col("bigram"), " ", -1))
      .join(broadcast(uni.select(col("token").as("x"), col("c1").as("cx"))), Seq("x"))
      .join(broadcast(uni.select(col("token").as("y"), col("c1").as("cy"))), Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("bigram"), col("c12").as("n"), col("cx"), col("cy"),
        expr("(c12 * t_tot * 100000) div (cx * cy)").as("score"))
      .orderBy(col("score").desc, col("bigram"))
      .limit(20)
  }

  /** Curriculum ordering: every document's exact global rank in
    * (n_chars, doc_id) order — the easy→hard global sort position a
    * length-curriculum sampler consumes — computed by
    * [[graft.operators.Ops.globalRowNumberScalable]]: monotone value
    * buckets + O(buckets) driver bases + bucket-local row_number, never
    * the single-task window `row_number() OVER (ORDER BY ...)` would plan
    * as. The final presentation orderBy is the only range exchange. */
  def qGlobalRank(s: SparkSession, d: String): DataFrame =
    Ops.globalRowNumberScalable(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "n_chars", Seq("doc_id"), "rank")
      .orderBy("rank")

  /** Robust outlier detection (median/MAD): events whose value-cents
    * deviate from their event-type median by > 3× the median absolute
    * deviation. Both medians are EXACT distributed percentiles over integer
    * cents — interpolated midpoints land on .5/.25 binary fractions, so
    * every compared double is exact and the flagged set is
    * bit-reproducible. The two 5-row stats tables broadcast back; the
    * event log is scanned, never hash-shuffled. */
  def qMadOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
      expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("cents") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .where(col("adev") > lit(3.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("cents"),
        col("adev"), col("med"), col("mad"))
      .orderBy("event_id")
  }

  /** Per-cohort least-squares trend: slope/intercept of value-cents over
    * days-since-2024-01-01, from the closed form on INTEGER power sums
    * (n, Σx, Σy, Σxy, Σx²) — one map-side-combinable aggregate, exact
    * long arithmetic (x ≤ 31, cents ≤ 5·10⁴ keep every sum far inside
    * long range at any declared SF), then ONE double division per
    * coefficient so both engines hit the identical IEEE quotient. */
  def qRegrTrend(s: SparkSession, d: String): DataFrame = {
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    Tables.events(s, d)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"),
        round(num / den, 6).as("slope"),
        round((col("sy").cast("double") - num / den * col("sx").cast("double"))
          / col("n").cast("double"), 6).as("intercept"))
      .transform(ps(col("event_type")))
  }

  /** Bigram next-token table (the 1st-order LM a corpus sanity check
    * reads): for every context token seen ≥ 10 times, its argmax follower
    * and the integer-exact conditional probability
    * `(c_xy · 10⁶) div c_x`. The argmax window is CONTEXT-partitioned
    * (never global), both count aggregates combine map-side, and the
    * vocabulary-sized context table broadcasts to the bigram side. */
  def qNextToken(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ctx = TextOps.explodedShingles(docs, "doc_id", "text", 1)
      .groupBy(col("shingle").as("context")).agg(count(lit(1)).as("cx"))
      .where(col("cx") >= 10)
    val w = Window.partitionBy(col("context"))
      .orderBy(col("cxy").desc, col("next_tok"))
    TextOps.explodedShingles(docs, "doc_id", "text", 2)
      .groupBy(col("shingle").as("bigram")).agg(count(lit(1)).as("cxy"))
      .withColumn("context", substring_index(col("bigram"), " ", 1))
      .withColumn("next_tok", substring_index(col("bigram"), " ", -1))
      .join(broadcast(ctx), Seq("context"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("context"), col("next_tok"), col("cxy").as("n"),
        expr(ppmDiv("cxy", "cx")).as("cond_ppm"))
      .orderBy("context")
  }

  /** Tokenizer-design coverage curve: what share of all corpus tokens the
    * top-k vocabulary covers, for k ∈ {10, 100, 1000}. The ranking only
    * ever materializes the top 1000 rows (TakeOrderedAndProject heaps →
    * window over ≤ 1000 rows), the unigram aggregate is map-side
    * combinable, and the share is the integer-exact
    * `(covered · 10⁶) div total`. */
  def qVocabCoverage(s: SparkSession, d: String): DataFrame = {
    val uni = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
      .groupBy(col("shingle").as("token")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("t_tot"))
    val top = uni.orderBy(col("c").desc, col("token")).limit(1000)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("c").desc, col("token"))).cast("long"))
    val ks = top.sparkSession.range(1, 4).select(
      pow(lit(10.0), col("id")).cast("long").as("k"))
    ks.join(broadcast(top), col("rn") <= col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_vocab"), sum(col("c")).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_vocab"), col("covered"),
        expr(ppmDiv("covered", "t_tot")).as("share_ppm"))
      .orderBy("k")
  }

  /** Per-source exact-dup audit (the dedup dashboard a corpus pipeline
    * reports): docs whose normalized-text fingerprint duplicates an
    * earlier doc ANYWHERE in the corpus, attributed to their source —
    * count, dup count, dup permille. One fingerprint-partitioned window
    * (same shape as q_exact_dedup) + a bounded per-source aggregate. */
  def qDedupAudit(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("f"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(Ops.normalizeText(col("text"))).as("f"))
      .withColumn("is_dup",
        when(col("doc_id") === min(col("doc_id")).over(w), 0L).otherwise(1L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dups"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        expr("(n_dups * 1000) div n_docs").as("dup_permille"))
      .transform(ps(col("source")))
  }

  /** Language-ID confusion matrix: labeled lang × heuristic prediction
    * counts — the eval table for the q_lang_id classifier. The prediction
    * ([[graft.operators.TextOps.langIdHeuristic]]) is computed inside the
    * scan projection (codegen'd, no join back), so the whole query is one
    * map + one bounded aggregate. */
  def qLangidConfusion(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), TextOps.langIdHeuristic(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .transform(ps(col("lang"), col("lang_pred")))

  /** Near-dup cluster size distribution (the dedup-audit histogram): group
    * sizes of the one-step LSH dedup map and how many clusters have each
    * size. Two BOUNDED aggregates on top of the map (canonical_id →
    * size → histogram) — output cardinality ≤ distinct sizes, so the
    * histogram costs nothing beyond the map itself. */
  def qClusterSizes(s: SparkSession, d: String): DataFrame = {
    val sig = TextOps.minhashSignatureMd5(Tables.documents(s, d), "doc_id", "text", 3, 4)
    TextOps.lshDedupMap(sig, "doc_id", 4)
      .groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        (col("cluster_size") * count(lit(1))).as("n_docs"))
      .transform(ps(col("cluster_size")))
  }

  /** Pad-vs-pack decision table: per source, the padding waste of the
    * NAIVE one-doc-per-sequence batching at context 256 — chunks =
    * ⌈n_tokens/256⌉ per doc, waste = padded − real tokens, integer-exact
    * permille. The number q_pack_sequences' concat-and-chunk packing is
    * justified against. One map-side-combinable aggregate. */
  def qPaddingWaste(s: SparkSession, d: String): DataFrame = {
    val ctx = 256L
    Tables.documents(s, d)
      .select(col("source"),
        size(filter(split(Ops.normalizeText(col("text")), " "), t => t =!= ""))
          .cast("long").as("n"))
      .select(col("source"), col("n"),
        expr(s"((n + ${ctx - 1}) div $ctx) * $ctx").as("padded"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("real_tokens"),
        sum(col("padded")).as("padded_tokens"))
      .select(col("source"), col("n_docs"), col("real_tokens"), col("padded_tokens"),
        expr("((padded_tokens - real_tokens) * 1000) div padded_tokens").as("waste_permille"))
      .transform(ps(col("source")))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the src0 and
    * src1 document-length distributions — the distribution-drift check a
    * training pipeline runs between corpus snapshots. Exact and float-free:
    * D is maximized over the integer cross-scaled ECDF gap
    * `|cum0·n1 − cum1·n0|` and reported as `(max · 10⁶) div (n0·n1)` ppm.
    * The cumulative window runs over the per-length aggregate (bounded by
    * distinct lengths, not docs); the argmax row comes off a 1-row
    * TakeOrdered. */
  def qKsDrift(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .where(col("source").isin("src0", "src1"))
      .select(col("source"),
        size(filter(split(Ops.normalizeText(col("text")), " "), t => t =!= ""))
          .cast("long").as("v"))
      .groupBy("v")
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c0"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum0", sum(col("c0")).over(w))
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("n0", sum(col("c0")).over(Window.partitionBy()))
      .withColumn("n1", sum(col("c1")).over(Window.partitionBy()))
      .withColumn("gap", abs(col("cum0") * col("n1") - col("cum1") * col("n0")))
      .orderBy(col("gap").desc, col("v"))
      .limit(1)
      .select(col("v").as("v_at_max"), col("n0"), col("n1"),
        expr("(gap * 1000000) div (n0 * n1)").as("d_ppm"))
  }

  /** Winsorized per-cohort mean: event value-cents clamped to their
    * event-type's [p05, p95] before averaging — the robust-mean
    * preprocessing step. The bounds are EXACT ORDER STATISTICS (the
    * ⌈p·n⌉-th smallest cents, all-integer `(p·n + 99) div 100` rank — no
    * interpolated percentile whose last-ulp float could flip a clamp
    * comparison), so clamp and sum stay in exact long arithmetic and the
    * only float op is the final mean's single IEEE division. The 5-row
    * bounds table broadcasts back; the rank window is type-partitioned. */
  def qWinsorize(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    val bounds = ev
      .withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy("event_type")
      .agg(min(when(col("rn") === expr("(5 * n + 99) div 100"), col("cents"))).as("lo"),
        min(when(col("rn") === expr("(95 * n + 99) div 100"), col("cents"))).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("wc", least(greatest(col("cents"), col("lo")), col("hi")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        sum(col("wc")).as("w_sum"))
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        (expr(roundDiv("w_sum", "n", 10000L)).cast("double") / 10000.0).as("wmean"))
      .transform(ps(col("event_type")))
  }

  /** Distinctive terms per source: top-5 tokens by relative-frequency lift
    * `(tf_s/n_s) / (tf_c/T)` against the whole corpus, as the
    * rank-preserving integer `(tf_s · T · 10⁴) div (n_s · tf_c)`, min
    * support 5 — the "what characterizes this slice" table of a corpus
    * explorer. Per-source counts shuffle once; the vocabulary-sized corpus
    * table and 20-row source totals broadcast; the ranking window is
    * source-partitioned. */
  def qSourceTerms(s: SparkSession, d: String): DataFrame = {
    val tfsAll = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).as("tf_s"))
    val srcTot = tfsAll.groupBy("source").agg(sum(col("tf_s")).as("n_s"))
    val tfs = tfsAll.where(col("tf_s") >= 5)
    val corp = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
      .groupBy(col("shingle").as("token")).agg(count(lit(1)).as("tf_c"))
    val tot = corp.agg(sum(col("tf_c")).as("t_tot"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lift_e4").desc, col("token"))
    tfs.join(broadcast(srcTot), Seq("source"))
      .join(broadcast(corp), Seq("token"))
      .crossJoin(broadcast(tot))
      .withColumn("lift_e4",
        expr(scaledDiv("(tf_s * t_tot)", "(n_s * tf_c)", 100L, 100L)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 5)
      .select(col("source"), col("token"), col("tf_s"), col("lift_e4"), col("rk"))
      .orderBy("source", "rk")
  }

  /** Corpus token-frequency Gini coefficient (vocabulary concentration —
    * the "how head-heavy is this corpus" diversity metric), integer-exact:
    * with tokens ranked ascending by count via
    * [[graft.operators.Ops.globalRowNumberScalable]] (the two-phase bucket
    * ranker — the vocabulary never collapses to one task),
    * `gini_ppm = ((2·Σ(rank·c) − (n+1)·Σc) · 10⁶) div (n · Σc)`. One
    * bounded 1-row output. */
  def qTokenGini(s: SparkSession, d: String): DataFrame = {
    val uni = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
      .groupBy(col("shingle").as("token")).agg(count(lit(1)).as("c"))
    Ops.globalRowNumberScalable(uni, "c", Seq("token"), "rank")
      .agg(count(lit(1)).as("n_vocab"), sum(col("c")).as("total_tokens"),
        sum(col("rank") * col("c")).as("s1"))
      .select(col("n_vocab"), col("total_tokens"),
        expr(ppmDiv("(2 * s1 - (n_vocab + 1) * total_tokens)",
          "(n_vocab * total_tokens)")).as("gini_ppm"))
  }

  /** Top event trigram paths: the 10 most common 3-step per-user event
    * sequences (two leads over one user-partitioned window → bounded
    * ≤ 5³ aggregate → TakeOrdered 10) — sequence mining one step past
    * q_event_transitions' bigrams. */
  def qTrigramPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(10)
  }

  /** Product stickiness: per calendar day, DAU and trailing-7-day WAU
    * (exact distinct users) and the integer-exact DAU/WAU permille. WAU
    * comes from a distinct (user, day) grid range-joined to a 7-day
    * window — the grid is |users|·|active days|, far below the event
    * count, and both distinct aggregates combine map-side. */
  def qStickiness(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud.as("a")
      .join(dau.select(col("day").as("anchor")).as("d"),
        col("a.day") <= col("d.anchor") &&
          col("a.day") > date_sub(col("d.anchor"), 7))
      .groupBy(col("d.anchor").as("day"))
      .agg(count_distinct(col("a.user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        expr("(dau * 1000) div wau").as("stickiness_permille"))
      .orderBy("day")
  }

  /** RFM segmentation: users quartiled per recency/frequency/monetary over
    * the user-level aggregate, then the bounded 64-cell segment census.
    * NOT ntile — a global ntile is a single-task window; instead each
    * metric is ranked by [[graft.operators.Ops.globalRowNumberScalable]]
    * (bucket-partitioned) and the quartile is the positional
    * `((rank−1)·4) div n + 1`, restated identically in the oracle, with
    * user_id as tiebreak so the census is deterministic. Cents keep
    * monetary integer-exact. */
  def qRfmCells(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .groupBy("user_id")
      .agg(datediff(max(col("ts").cast("date")), lit("1990-01-01").cast("date"))
          .cast("long").as("r_days"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents"))
    val n = users.count()
    val ranked = Seq("r_days", "freq", "cents").foldLeft(users)((df, m) =>
      Ops.globalRowNumberScalable(df, m, Seq("user_id"), s"__rk_$m"))
    def quart(rankCol: String): Column =
      expr(s"(($rankCol - 1) * 4) div $n + 1")
    ranked
      .select(quart("__rk_r_days").as("r_q"), quart("__rk_freq").as("f_q"),
        quart("__rk_cents").as("m_q"), col("cents"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents"))
      .transform(ps(col("r_q"), col("f_q"), col("m_q")))
  }

  /** Shipping-priority top-10 (TPC-H Q3 shape): unshipped-revenue ranking
    * of BUILDING-segment orders around a cutoff date. Revenue is the
    * integer cent-percent `price_c · (100 − disc_pct)` — exact long sums,
    * no float accumulation order to drift. Both probe-side filters reach
    * their scans; the customer key join is a plain equi-join (AQE
    * broadcasts it at fixture scale, shuffles it at warehouse scale); the
    * top-10 is TakeOrderedAndProject. */
  def qShipPriority(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("date")
    val cust = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate").cast("date") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(s, d)
      .where(col("l_shipdate").cast("date") > cutoff)
      .select(col("l_orderkey"),
        (expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100, 0) AS BIGINT)"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue_cp"))
      .orderBy(col("revenue_cp").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(10)
  }

  /** Supplier-nation market share (TPC-H Q8 shape): per order-year within
    * the ASIA customer region, the revenue share of lineitems supplied by
    * CHINA-nation suppliers, as the integer-exact
    * `(nation_cents · 10⁶) div total_cents` over exact cent-percent sums.
    * All four dimension joins broadcast (region→nation→{customer,
    * supplier} are tiny at every scale); the fact table shuffles once for
    * the per-year aggregate. */
  def qMarketShare(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
    val custAsia = Tables.customer(s, d)
      .join(broadcast(nat
          .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNat = Tables.supplier(s, d)
      .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100, 0) AS BIGINT)"))).as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(custAsia, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(sum(col("rev")).as("total_cp"),
        sum(when(col("supp_nation") === "CHINA", col("rev")).otherwise(0L))
          .as("nation_cp"))
      .select(col("o_year"), col("total_cp"), col("nation_cp"),
        expr(ppmDiv("nation_cp", "total_cp")).as("share_ppm"))
      .transform(ps(col("o_year")))
  }

  /** Market-basket affinity: top-20 part pairs co-purchased within an
    * order, ranked by integer lift `(c_xy · n_orders · 10⁴) div (c_x·c_y)`
    * at min support 5. The pair expansion is the within-order self-join of
    * DISTINCT (order, part) — bounded by order size (≤ 7 lineitems), so
    * pairs grow linearly with orders, never quadratically with parts; the
    * per-part counts broadcast back onto the pair aggregate. */
  def qPartAffinity(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val cnt = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("c1"))
    val tot = op.select(col("l_orderkey")).distinct().agg(count(lit(1)).as("n_orders"))
    op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= 5)
      .join(broadcast(cnt.select(col("l_partkey").as("part_a"), col("c1").as("cx"))), Seq("part_a"))
      .join(broadcast(cnt.select(col("l_partkey").as("part_b"), col("c1").as("cy"))), Seq("part_b"))
      .crossJoin(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("c_xy"),
        expr("(c_xy * n_orders * 10000) div (cx * cy)").as("lift_e4"))
      .orderBy(col("lift_e4").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Shared scored-embeddings frame for the evaluation-metric queries:
    * a deterministic integer score per vector — the Knuth-seed dot product
    * with each elementwise product rounded to an integer BEFORE summing,
    * so the total is an order-free exact long (a raw double dot would rank
    * differently across engines on a last-ulp tie). */
  private def scoredEmbeddings(s: SparkSession, d: String): DataFrame = {
    val vExpr = "transform(sequence(1, 64), j -> " +
      "CAST((j * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5)"
    Tables.embeddings(s, d).select(col("vec_id"),
      col("label").cast("long").as("label"),
      expr(s"aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), " +
        s"$vExpr, (a, b) -> CAST(round(a * b * 1000000, 0) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("score"))
  }

  /** One-vs-rest AUC per class via the Mann-Whitney rank-sum — the
    * model-evaluation metric computed from ONE global ranking pass (the
    * two-phase bucket ranker, never a single-task window):
    * `U_c = Σ_{label=c} rank − n_c(n_c+1)/2`, `AUC_ppm = ⌊U_c·10⁶ /
    * (n_c·(N−n_c))⌋` — all exact integers, ties resolved by the
    * deterministic (score, vec_id) total order. Headroom: the two-step
    * ppm lift is exact to `U ≤ 9.2·10¹⁵` (N ≈ 1.9·10⁸ rows); shard the
    * ranking beyond that. */
  def qAucPerClass(s: SparkSession, d: String): DataFrame = {
    val scored = scoredEmbeddings(s, d)
    val ranked = Ops.globalRowNumberScalable(scored, "score", Seq("vec_id"), "rank")
    val tot = scored.agg(count(lit(1)).as("n_total"))
    ranked.groupBy(col("label").as("class"))
      .agg(count(lit(1)).as("n_pos"), sum(col("rank")).as("rank_sum"))
      .crossJoin(broadcast(tot))
      .select(col("class"), col("n_pos"),
        expr("rank_sum - (n_pos * (n_pos + 1)) div 2").as("u_stat"),
        col("n_total"))
      .select(col("class"), col("n_pos"), col("u_stat"),
        expr(ppmDiv("u_stat", "(n_pos * (n_total - n_pos))")).as("auc_ppm"))
      .transform(ps(col("class")))
  }

  /** Score-decile reliability table (calibration curve): rows bucketed by
    * exact global score decile `((rank−1)·10) div N + 1`, per-decile row
    * count, positive count (label ≥ 5), positive rate ppm and the exact
    * integer score sum (no mean division — scores may be negative and
    * floor-vs-truncate would diverge between engines). Same single
    * ranking pass as the AUC; 10 output rows at any scale. */
  def qCalibrationBins(s: SparkSession, d: String): DataFrame = {
    val scored = scoredEmbeddings(s, d)
    val ranked = Ops.globalRowNumberScalable(scored, "score", Seq("vec_id"), "rank")
    val tot = scored.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(tot))
      .select(expr("((rank - 1) * 10) div n_total + 1").as("decile"),
        col("label"), col("score"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") >= 5L, 1L).otherwise(0L)).as("n_pos"),
        sum(col("score")).as("sum_score"))
      .select(col("decile"), col("n"), col("n_pos"),
        expr(ppmDiv("n_pos", "n")).as("pos_ppm"), col("sum_score"))
      .transform(ps(col("decile")))
  }

  /** CUSUM change-point per order priority: the day where the cumulative
    * deviation of daily revenue from a flat baseline peaks —
    * `dev_k = |n·P_k − k·total|` over day-ordered prefix sums, all exact
    * integer cents (the classic mean-shift detector with the rational
    * mean lifted to integers: n·P_k − k·total = n·(P_k − k·mean)).
    * Per-priority windows are calendar-bounded (≤ days rows per group),
    * the (n, total) baseline rides a broadcast, and the argmax day is a
    * deterministic (dev desc, day) rank. Headroom: `n_days·total_cents`
    * ≤ 2⁶³ holds to ~10¹⁴ cents of revenue per priority across 10⁴ days. */
  def qChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
    val base = daily.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total_cents"))
    val wDay = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = daily
      .withColumn("p", sum(col("x")).over(wDay))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))).cast("long"))
      .join(broadcast(base), Seq("o_orderpriority"))
      .withColumn("cusum_dev",
        abs(col("n_days") * col("p") - col("k") * col("total_cents")))
    dev.withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("cusum_dev").desc, col("day"))))
      .where(col("rn") === 1)
      .select(col("o_orderpriority"), col("day"), col("n_days"),
        col("total_cents"), col("cusum_dev"))
      .transform(ps(col("o_orderpriority")))
  }

  /** Seasonal-baseline anomaly ranking: each (date, hour) event count
    * against its (day-of-week, hour) baseline across all observed dates —
    * `ratio_ppm = (count·n_dates_of_dow·10⁶) div cell_total`, exact via
    * the two-step lift (headroom `count·n_dates ≤ 9.2·10¹⁵`). The dow
    * calendar and the 7×24 baseline grid are bounded at any scale and
    * broadcast back onto the hourly aggregate; the top-20 anomalies rank
    * by TakeOrdered, never a global sort. */
  def qSeasonalAnomaly(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("ts").cast("date").as("day"),
      hour(col("ts")).cast("long").as("hr"))
    val hourly = ev.groupBy("day", "hr").agg(count(lit(1)).as("cnt"))
    val dowOf = dayofweek(col("day")).cast("long")
    val dates = ev.select("day").distinct()
    val dowN = dates.select(col("day"), dowOf.as("dow"))
      .groupBy("dow").agg(count(lit(1)).as("n_dates"))
    val cellTotal = hourly.select(dowOf.as("dow"), col("hr"), col("cnt"))
      .groupBy("dow", "hr").agg(sum(col("cnt")).as("cell_total"))
    hourly.select(col("day"), col("hr"), col("cnt"), dowOf.as("dow"))
      .join(broadcast(dowN), Seq("dow"))
      .join(broadcast(cellTotal), Seq("dow", "hr"))
      .select(col("day"), col("hr"), col("cnt"), col("n_dates"),
        col("cell_total"),
        expr(scaledDiv("(cnt * n_dates)", "cell_total", 1000L, 1000L))
          .as("ratio_ppm"))
      .orderBy(col("ratio_ppm").desc, col("day"), col("hr"))
      .limit(20)
  }

  /** Fuzzy self-match (edit distance 1) via deletion-neighborhood
    * blocking — the scalable spell-correction / fuzzy-dedup pattern: each
    * name emits itself plus its |name| single-character deletions as block
    * keys (row-local explode); any two strings within one edit share a
    * block, so candidates come from an equi-join on the block key instead
    * of the O(n²) all-pairs scan, and every candidate is verified with
    * the codegen'd `levenshtein`. Block sizes are bounded by the alphabet
    * (≤ 10 digit variants here), so candidate pairs grow linearly with
    * rows — the oracle states the naive quadratic join; results must be
    * identical. */
  def qFuzzyMatch(s: SparkSession, d: String): DataFrame = {
    // Degenerate-block cap (the [[operators.TextOps.lshCandidatePairs]]
    // guard, same constant): the in-block expansion is quadratic in block
    // size, so a pathological corpus (thousands of names one deletion
    // apart — NOT this fixture, whose blocks are digit-alphabet-bounded)
    // must not build an unbounded in-task array. Blocks are sized with a
    // count aggregate BEFORE any list is collected; oversized blocks are
    // skipped, never materialized. Audit path at scale: the
    // [[operators.TextOps.lshOversizedBuckets]] pattern (skipped keys as
    // data) or an `Observation` on the size aggregate.
    val maxBlock = 1000
    val names = Tables.customer(s, d).select(col("c_name").as("name")).distinct()
    val blocks = names.select(col("name"),
      explode(expr("array_union(array(name), transform(sequence(1, length(name)), " +
        "i -> concat(substring(name, 1, i - 1), substring(name, i + 1, length(name)))))"))
        .as("blk"))
    // One groupBy shuffle of the (block, name) rows, then IN-BLOCK pair
    // expansion (the LSH-bucket pattern) — no self-join build side. The
    // size table and the probe hash-partition on the same `blk` key, so
    // the shuffle_hash keep-join rides the existing exchange (a broadcast
    // build would collect O(blocks) keys to the driver). The codegen'd
    // levenshtein verifies map-side BEFORE the distinct, which then only
    // shuffles true pairs. (Measured at sf0.1: self-join + distinct-first
    // 31 s → join + verify-first 25 s → this form ~14 s, all scratch-inclusive.)
    val keep = blocks.groupBy(col("blk")).agg(count(lit(1)).as("__n"))
      .where(col("__n").between(2, maxBlock))
      .select("blk").hint("shuffle_hash")
    blocks.join(keep, Seq("blk"))
      .groupBy(col("blk")).agg(collect_list(col("name")).as("names"))
      .select(explode(expr(
        "flatten(transform(names, a -> filter(transform(names, b -> " +
          "struct(a AS name_a, b AS name_b)), p -> p.name_a < p.name_b)))"))
        .as("pair"))
      .select(col("pair.name_a").as("name_a"), col("pair.name_b").as("name_b"))
      .where(expr("levenshtein(name_a, name_b) = 1"))
      .distinct()
      .orderBy("name_a", "name_b")
  }

  /** Algebraic re-aggregation audit: quarter totals computed by MERGING
    * monthly partials (sum/min/max/count re-aggregate, XOR checksums
    * fold) — the cube-materialization / incremental-rollup primitive. The
    * oracle computes the quarters DIRECTLY from rows, so the hash match
    * itself proves merge(partials) ≡ direct for every aggregate, checksum
    * included. Both levels combine map-side; nothing rescans the fact. */
  def qReaggAudit(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.orders(s, d).select(
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
      concat(date_format(col("o_orderdate"), "yyyy"), lit("-Q"),
        quarter(col("o_orderdate"))).as("qtr"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"),
      expr("CAST(conv(substr(md5(concat_ws('|', o_orderkey, o_custkey, " +
        "o_orderstatus, CAST(round(o_totalprice * 100, 0) AS BIGINT), " +
        "date_format(o_orderdate, 'yyyy-MM-dd'), o_orderpriority)), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
    val monthly = rows.groupBy(col("qtr"), col("ym"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"),
        expr("bit_xor(h)").as("xs"))
    monthly.groupBy(col("qtr"))
      .agg(count(lit(1)).as("n_months"), sum(col("n")).as("n_rows"),
        sum(col("sc")).as("total_cents"), min(col("mn")).as("min_cents"),
        max(col("mx")).as("max_cents"), expr("bit_xor(xs)").as("checksum"))
      .transform(ps(col("qtr")))
  }

  /** One PCA power-iteration step over the embedding corpus:
    * `w = Σ_rows (x·v)·x` for a deterministic Knuth-hash seed direction v
    * — the distributed Gram-matrix-times-vector kernel behind spectral
    * methods, without ever materializing the d×d Gram matrix. The per-row
    * dot is row-local (zip_with/aggregate HOFs, zero shuffle); the only
    * exchange carries dim-bounded (pos, partial-sum) rows. Output doubles
    * are rounded (summation-order drift), per the file contract. */
  def qPowerIteration(s: SparkSession, d: String): DataFrame = {
    val vExpr = "transform(sequence(1, 64), j -> " +
      "CAST((j * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5)"
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("dot",
        expr(s"aggregate(zip_with(emb, $vExpr, (a, b) -> a * b), " +
          "0D, (acc, x) -> acc + x)"))
      .select(col("dot"), posexplode(col("emb")).as(Seq("pos0", "val")))
      .groupBy((col("pos0") + 1).cast("long").as("pos"))
      .agg(round(sum(col("dot") * col("val")), 2).as("w"))
      .transform(ps(col("pos")))
  }

  /** Zipf rank-bucket profile of the corpus token distribution: tokens
    * ranked globally by (frequency desc, token) via the two-phase bucket
    * ranker (never a SinglePartition window), then folded into power-of-2
    * rank buckets — the log-log frequency curve as exact integers. The
    * bucket is an integer CASE chain (2^b ≤ rank), no float log2 to flip
    * a boundary; the corpus total rides a 1-row broadcast. ≤ 41 output
    * rows at any scale. */
  def qZipfProfile(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(explode(graft.functions.Shingles.shingles(
        Ops.normalizeText(col("text")), 1)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .withColumn("neg_c", -col("c"))
    val ranked = Ops.globalRowNumberScalable(cnt, "neg_c", Seq("token"), "rank")
    val bucket = (0 to 40).foldLeft(lit(-1L)) { (acc, b) =>
      when(col("rank") >= (1L << b), lit(b.toLong)).otherwise(acc)
    }
    val total = cnt.agg(sum(col("c")).as("total"))
    ranked.select(bucket.as("rank_bucket"), col("c"))
      .groupBy("rank_bucket")
      .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("freq"))
      .crossJoin(broadcast(total))
      .select(col("rank_bucket"), col("n_tokens"), col("freq"),
        expr(ppmDiv("freq", "total")).as("freq_ppm"))
      .transform(ps(col("rank_bucket")))
  }

  /** Order-independent table checksum per month — the replica-validation /
    * migration-audit primitive: each row canonicalized to a typed string
    * (integers, cents, ISO dates — no float formatting to diverge between
    * engines), md5'd, the first 15 hex chars (60 bits, always positive in
    * a long) XOR-folded per group. XOR is commutative, associative and
    * overflow-free, so the aggregate is map-side combinable and identical
    * under any row order or partitioning — two tables match iff (count,
    * checksum) match per partition-month. */
  def qTableChecksum(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        expr("CAST(conv(substr(md5(concat_ws('|', o_orderkey, o_custkey, " +
          "o_orderstatus, CAST(round(o_totalprice * 100, 0) AS BIGINT), " +
          "date_format(o_orderdate, 'yyyy-MM-dd'), o_orderpriority)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
      .orderBy(col("ym"))

  /** Triangle participation in the co-purchase graph: parts ranked by how
    * many co-purchase triangles (3 parts pairwise co-ordered ≥ 2 times)
    * they close. Execution is the degree-ordered orientation algorithm:
    * every edge points from its lower-(degree, id) endpoint, bounding
    * out-degree by O(√m) — so the wedge self-join is Σ outdeg² ≈ m^1.5
    * worst-case instead of the naive hub-degree square, and each triangle
    * is enumerated exactly once. The oracle states the naive canonical
    * a<b<c triple join; both must produce the identical top-20. */
  def qTriangleCount(s: SparkSession, d: String): DataFrame = {
    val (e, _) = coPurchaseGraph(s, d)
    coPurchaseTriangles(e)
      .select(explode(array(col("w"), col("u"), col("v"))).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("l_partkey"))
      .limit(20)
  }

  /** The co-purchase graph shared by the graph-analytics queries: an edge
    * joins two parts that co-occur in ≥2 orders (canonical pa < pb), plus
    * the per-node degree table. Edge build is one self-equi-join under the
    * order key (expansion bounded by order size), never a cross join. */
  private def coPurchaseGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("pa", "pb")
    val deg = e.select(col("pa").as("n")).unionAll(e.select(col("pb").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    (e, deg)
  }

  /** Triangle enumeration via degree-ordered orientation (each edge points
    * low→high degree, so out-degree is O(√m) and the wedge join is
    * skew-proof); emits each triangle once as (w, u, v). The wedge side is
    * equi-joined back to the edge set — never a cartesian. */
  private def coPurchaseTriangles(e: DataFrame): DataFrame = {
    val deg = e.select(col("pa").as("n")).unionAll(e.select(col("pb").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("n").as("pa"), col("d").as("da")), Seq("pa"))
      .join(deg.select(col("n").as("pb"), col("d").as("db")), Seq("pb"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("pa") < col("pb")), col("pa"))
          .otherwise(col("pb")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("pa") < col("pb")), col("pb"))
          .otherwise(col("pa")).as("dst"))
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.src") === col("y.src") &&
        col("x.dst") < col("y.dst"))
      .select(col("x.src").as("w"), col("x.dst").as("u"), col("y.dst").as("v"))
    wedges.join(e,
      col("pa") === least(col("u"), col("v")) &&
        col("pb") === greatest(col("u"), col("v")))
      .select(col("w"), col("u"), col("v"))
  }

  /** Simpson concentration of the per-source token distribution —
    * `λ_ppm = ⌊Σc² · 10⁶ / T²⌋` plus the inverse-Simpson effective type
    * count `⌊T² / Σc²⌋` (the "how many equally-common tokens would look
    * like this corpus" diversity number behind mixture design). All
    * integer-exact: the ppm divides by T twice (nested floor division is
    * exact), with the first step the overflow-safe two-step lift. Exact
    * headroom: per-source `Σc² ≤ 9.2·10¹⁷` (worst case T ≈ 9.6·10⁸ tokens
    * in one source if a single token dominates) and `T ≤ 3·10⁹` for the
    * `T²` numerator — beyond that, shard sources into subgroups and
    * combine. Token counts aggregate map-side twice (token, then source);
    * output is the bounded source list. */
  def qSimpsonDiversity(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("source"))
      .agg(sum(col("c")).as("t_tok"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("source"), col("t_tok"), col("n_types"), col("sum_c2"),
        expr("(" + scaledDiv("sum_c2", "t_tok", 10L, 100000L) + ") div t_tok")
          .as("simpson_ppm"),
        expr("(t_tok * t_tok) div sum_c2").as("eff_types"))
      .transform(ps(col("source")))
  }

  /** Per-source type-token-ratio profile: each document's TTR
    * (`distinct tokens · 10⁶ div tokens` — the classic lexical-diversity
    * quality signal), aggregated to min/max/mean per source. Both
    * aggregation levels are map-side combinable; the per-doc distinct is
    * a (doc, token) pre-aggregate, never a `collect_set`. Empty documents
    * carry no tokens and drop out (same contract as every TP_TOK oracle). */
  def qTtrProfile(s: SparkSession, d: String): DataFrame = {
    val perDoc = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .groupBy(col("doc_id"), col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("n_types"))
      .select(col("source"),
        expr("(n_types * 1000000) div n_tok").as("ttr_ppm"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), min(col("ttr_ppm")).as("min_ttr_ppm"),
        max(col("ttr_ppm")).as("max_ttr_ppm"),
        expr("CAST(sum(ttr_ppm) AS BIGINT) div count(1)").as("avg_ttr_ppm"))
      .transform(ps(col("source")))
  }

  /** Small-quantity revenue loss per brand (TPC-H Q17 shape): for every
    * brand, the cent revenue of lineitems whose quantity is below 20% of
    * that part's average order quantity. The correlated `avg` is exact
    * integer arithmetic — `qty < 0.2·(sum/cnt)` ⟺ `5·qty·cnt < sum` (the
    * fixture quantities are integral) — so no float comparison can flip a
    * row. One shuffle builds the per-part (cnt, sum) aggregate; the fact
    * re-join lands on the same `l_partkey` hash partitioning (no second
    * fact shuffle); the part dimension broadcasts for the brand label.
    * Output is the bounded 25-brand table. */
  def qSmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("price_c"))
    val perPart = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("sum_qty"))
    li.join(perPart, Seq("l_partkey"))
      .where(col("qty") * lit(5L) * col("cnt") < col("sum_qty"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small_lines"), sum(col("price_c")).as("loss_c"))
      .transform(ps(col("p_brand")))
  }

  /** Top supplier(s) by quarterly revenue (TPC-H Q15 shape): exact
    * cent-percent revenue per supplier over 1998Q1 shipments, returning
    * every supplier tied at the maximum (the view + HAVING max semantics
    * of the original). The global max is a 1-row aggregate broadcast back
    * onto the bounded per-supplier table — no global sort, no window over
    * an unpartitioned frame; the supplier dimension broadcasts. */
  def qTopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .where(col("l_shipdate").cast("date") >= lit("1998-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1998-04-01").cast("date"))
      .select(col("l_suppkey"),
        (expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100, 0) AS BIGINT)"))).as("rev"))
      .groupBy("l_suppkey")
      .agg(sum(col("rev")).as("revenue_cp"))
    val top = rev.agg(max(col("revenue_cp")).as("max_cp"))
    rev.crossJoin(broadcast(top))
      .where(col("revenue_cp") === col("max_cp"))
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cp"))
      .orderBy(col("s_suppkey"))
  }

  /** Large-volume orders (TPC-H Q18 shape): orders whose total lineitem
    * quantity exceeds 280 units, with their customer and exact cent value.
    * The quantity screen is a map-side-combinable sum + HAVING on the
    * order key (one fact shuffle); only the surviving ~1% of orders join
    * to the orders/customer tables, so the probe side is pre-shrunk
    * before any dimension touch. Quantities are integral longs — the
    * threshold can never flip on accumulation order. */
  def qLargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .where(col("total_qty") > 280L)
    big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("total_cents"),
        col("total_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
  }

  /** Source-vocabulary overlap matrix: pairwise Jaccard (ppm) of the
    * distinct-token sets of every source pair — the corpus-comparison
    * table behind mixture design. Pairs are generated PER TOKEN from the
    * ≤ |sources| list that contains it (≤ C(20,2) per token — linear in
    * vocab, never |vocab|² ), intersections aggregate map-side, and set
    * sizes broadcast back onto the bounded 190-row pair table. */
  def qVocabOverlap(s: SparkSession, d: String): DataFrame = {
    val st = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .distinct()
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n_tok"))
    val inter = st.as("a")
      .join(st.as("b"), col("a.token") === col("b.token") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n_tok").as("na"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n_tok").as("nb"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"),
        expr("(n_common * 1000000) div (na + nb - n_common)").as("jaccard_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** One-pass data profiling of the event log: per column, null count and
    * exact distinct cardinality — the schema-quality census a warehouse
    * job emits before load. ONE scan computes every stat (multiple
    * aggregates in a single Aggregate node); `stack` reshapes the 1-row
    * result to the 6-row report, so the profile costs one pass regardless
    * of column count. */
  def qNullProfile(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"))
    }
    val stackExpr = "stack(" + cols.size + ", " +
      cols.map(c => s"'$c', ${c}__nulls, ${c}__distinct").mkString(", ") +
      ") AS (column_name, n_null, n_distinct)"
    ev.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(col("n_rows"), expr(stackExpr))
      .select(col("column_name"), col("n_rows"), col("n_null"), col("n_distinct"))
      .orderBy("column_name")
  }

  /** LSH tuning audit — precision of MinHash-band candidate generation:
    * candidate pairs, grouped by how many of the 4 bands matched, scored
    * for the fraction that is a TRUE near-dup by exact 3-shingle Jaccard
    * ≥ 0.5 (the all-integer test `3·|A∩B| ≥ |A|+|B|`, no float
    * threshold). The table that picks the band count before a 100 TB
    * dedup run. Scale design: a dup-dense corpus makes the candidate set
    * quadratic in cluster size (325 M pairs on the 100× study fixture),
    * and pair-level exact verification is Ω(pairs) in ANY join shape — so
    * the audit runs on a deterministic ~100 k-pair thinning
    * ([[graft.operators.TextOps.lshCandidatePairsSampled]]; the identity
    * below 100 k pairs, so oracle fixtures are verified exactly, with K
    * sized from the band-bucket histogram, never by counting the
    * materialized pair set), BEFORE the signature joins and the shingle
    * expansion pay per-pair cost. */
  def qLshPrecision(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // The signature frame is read five times in this DAG (band pipeline,
    // K-sizing histogram, the a/b estimate sides); a single declarative
    // plan re-derives it per reference STATICALLY, but AQE's runtime
    // stage reuse dedupes the identical exchanges (measured at the 100×
    // study scale: 3.9 GB shuffle written vs 17.7 GB read — each written
    // stage re-read, not recomputed), so no materialization step is
    // needed or wanted (a localCheckpoint of the 325 M-row candidate set
    // was measured strictly worse: ~25 GB of cache serialization, and at
    // MEMORY_AND_DISK it starves the execution pool that builds it).
    val sig = TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4)
    val pairs = TextOps.lshCandidatePairsSampled(sig, "doc_id", 4,
      TextOps.DefaultPairBudget)
    val est = TextOps.estimatedJaccardForPairs(pairs, sig, "doc_id", 4)
      .select("id_a", "id_b", "matches")
    // The exact-Jaccard audit below only ever reads shingles of docs that
    // appear in a sampled pair, so restrict the corpus BEFORE the shingle
    // explosion: the unrestricted explosion is |corpus| x |doc| rows
    // re-shuffled three times (measured: >77 GB of transient shuffle at
    // 100x sf0.1, killing the run; sample-bounded it is ≤ 2·target docs'
    // shingles). The signature subplan feeding both `est` uses is
    // identical, so ReuseExchange materializes it once.
    val candDocs = est.select(col("id_a").as("doc_id"))
      .union(est.select(col("id_b").as("doc_id"))).distinct()
    val docsC = docs.join(candDocs, Seq("doc_id"), "left_semi")
    val sh = TextOps.explodedShingles(docsC, "doc_id", "text", 3).distinct()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = est.select("id_a", "id_b")
      .join(sh.select(col("doc_id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    est
      .join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .join(sz.select(col("doc_id").as("id_a"), col("sz").as("sza")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("sz").as("szb")), Seq("id_b"))
      .withColumn("is_true",
        when(col("inter") * 3 >= col("sza") + col("szb"), 1L).otherwise(0L))
      .groupBy("matches")
      .agg(count(lit(1)).as("n_pairs"), sum(col("is_true")).as("n_true"))
      .select(col("matches"), col("n_pairs"), col("n_true"),
        expr("(n_true * 1000000) div n_pairs").as("precision_ppm"))
      .transform(ps(col("matches")))
  }

  /** Cumulative user-acquisition curve: per day, first-seen ("new") users
    * and the running total of distinct users ever seen — growth reporting.
    * First-seen collapses the event log to |users| rows (map-side-combined
    * min), the daily aggregate is calendar-bounded, and the running sum's
    * window is over ≤ |days| rows. */
  def qUserGrowth(s: SparkSession, d: String): DataFrame = {
    val firstDay = Tables.events(s, d)
      .groupBy("user_id").agg(min(col("ts").cast("date")).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstDay.groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy("day")
  }

  /** LSH recall audit (the complement of [[qLshPrecision]]): the fraction
    * of TRUE near-dup pairs (exact integer 3-shingle Jaccard ≥ 0.5, via
    * df-capped [2,1000] posting lists — bounded expansion, never an
    * all-pairs join) that the 4-band MinHash candidate generation
    * captures — estimated over a deterministic ~100 k sample of the
    * true-pair universe once it outgrows that budget (identity below it;
    * see the in-body comment). One summary row; together with the
    * precision table this is the band-count tuning loop a dedup pipeline
    * runs (at 100 TB, on a corpus sample) before committing the full
    * pass. */
  def qLshRecall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sh = TextOps.explodedShingles(docs, "doc_id", "text", 3).distinct()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dft = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 1000))
    // Same sample-bounded audit design as [[qLshPrecision]], on the
    // TRUE-pair universe: its enumeration is Σ C(df,2) over the capped
    // shingle-df histogram — quadratic in dup-cluster size — so BOTH
    // sides of the recall join are thinned by the shared keep-one-in-K
    // pair rule (TextOps.pairSampleKeep; K from the df histogram via
    // TextOps.pairBudgetK, a metadata-scale aggregate; identity below
    // the 100 k budget so small fixtures audit the exact full set).
    // Because the rule is a pure function of the PAIR ids, thinning
    // commutes with the per-pair intersection count (every occurrence of
    // a kept pair is kept), and applying it BEFORE the pair aggregation
    // keeps the quadratic expansion inside one codegen stage — generated,
    // filtered, never shuffled. Recall over a uniform pair sample is an
    // unbiased estimate of full-set recall.
    val kT = TextOps.pairBudgetK(dft, "df", TextOps.DefaultPairBudget)
    def keepSampled(pairs: DataFrame): DataFrame =
      TextOps.pairSampleKeep(pairs, kT)
    val inter = keepSampled(
      sh.join(dft.select("shingle"), Seq("shingle"))
        .groupBy("shingle").agg(collect_list(col("doc_id")).as("ids"))
        .select(explode(col("ids")).as("id_a"), col("ids"))
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .where(col("id_a") < col("id_b")))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val truePairs = inter
      .join(sz.select(col("doc_id").as("id_a"), col("sz").as("sza")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("sz").as("szb")), Seq("id_b"))
      .where(col("inter") * 3 >= col("sza") + col("szb"))
      .select("id_a", "id_b")
    val sig = TextOps.minhashSignatureMd5(docs, "doc_id", "text", 3, 4)
    val cand = keepSampled(TextOps.lshCandidatePairs(sig, "doc_id", 4))
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    truePairs.join(cand, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_captured"))
      .select(col("n_true"), col("n_captured"),
        expr("CASE WHEN n_true = 0 THEN 0 ELSE (n_captured * 1000000) div n_true END")
          .as("recall_ppm"))
  }

  /** Customer order-cadence percentiles: per market segment, the p25/p50/
    * p90 of days between a customer's consecutive orders — the
    * inter-arrival profile behind replenishment forecasting. The lag
    * window is customer-partitioned; gaps are exact integer days; the
    * percentile is the same exact distributed interpolation q_percentiles
    * pins, rounded for presentation. */
  def qOrderGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"), col("o_orderkey"))
    val gaps = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"))
      .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)).cast("long"))
      .where(col("gap").isNotNull)
    // plain equi-join: customer is a large dim at warehouse scale — AQE
    // broadcasts it at fixture scale, shuffles it when it outgrows the
    // threshold
    gaps.join(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap, 0.25)"), 2).as("p25"),
        round(expr("percentile(gap, 0.5)"), 2).as("p50"),
        round(expr("percentile(gap, 0.9)"), 2).as("p90"))
      .transform(ps(col("c_mktsegment")))
  }

  /** Dedup candidate-graph health: the degree distribution of the LSH
    * candidate-pair graph (how many candidate partners each doc has, then
    * how many docs have each degree). A skewed tail here is the early
    * warning that a band is degenerating toward quadratic buckets. Two
    * bounded aggregates over the capped pair table. */
  def qDupDegree(s: SparkSession, d: String): DataFrame = {
    val sig = TextOps.minhashSignatureMd5(Tables.documents(s, d), "doc_id", "text", 3, 4)
    val cand = TextOps.lshCandidatePairs(sig, "doc_id", 4)
    cand.select(col("id_a").as("doc_id"))
      .unionAll(cand.select(col("id_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_docs"))
      .transform(ps(col("degree")))
  }

  /** Corpus length profile: per language, power-of-2 token-length buckets
    * (the largest b ≤ 11 with 2^b ≤ n) with doc counts and total tokens —
    * the length histogram a context-window/packing decision reads. The
    * log2 bucket is an integer comparison chain, not `floor(ln n / ln 2)`,
    * so no float can misbucket a boundary length. One map-side-combinable
    * aggregate, ≤ |langs|·12 output rows. */
  def qLenProfile(s: SparkSession, d: String): DataFrame = {
    val n = size(filter(split(Ops.normalizeText(col("text")), " "), t => t =!= ""))
      .cast("long")
    // integer-exact log2 bucket: the largest b with 2^b <= n (n >= 1)
    val bucket = (0 to 11).foldLeft(lit(-1L)) { (acc, b) =>
      when(n >= (1L << b), lit(b.toLong)).otherwise(acc)
    }
    Tables.documents(s, d)
      .select(col("lang"), n.as("n_tokens"), bucket.as("len_bucket"))
      .where(col("n_tokens") > 0)
      .groupBy("lang", "len_bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .transform(ps(col("lang"), col("len_bucket")))
  }

  /** Categorical drift between month halves: per event type, the two
    * periods' counts and the cross-scaled mix gap, plus the total
    * variation distance `TVD = Σ|p1 − p2| / 2` as the integer-exact
    * `(Σ|c1·n2 − c2·n1| · 10⁶) div (2·n1·n2)` ppm carried on every row —
    * the categorical companion to q_ks_drift's numeric ECDF test. One
    * bounded (≤ |types|) aggregate; the totals ride a 1-row broadcast. */
  def qTvdDrift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("h1"))
    val cnt = ev.groupBy("event_type")
      .agg(sum(col("h1")).as("c1"), sum(lit(1L) - col("h1")).as("c2"))
    cnt.crossJoin(broadcast(cnt.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))))
      .withColumn("gap", abs(col("c1") * col("n2") - col("c2") * col("n1")))
      .withColumn("gap_sum", expr("sum(gap) OVER ()"))
      .withColumn("tvd_ppm", expr(ppmDiv("gap_sum", "(2 * n1 * n2)")))
      .select(col("event_type"), col("c1"), col("c2"), col("gap"), col("tvd_ppm"))
      .transform(ps(col("event_type")))
  }

  /** Debounce dedup census: events collapsed to the FIRST per (user, type,
    * 5-minute epoch window) — the batch twin of the streaming
    * dropDuplicatesWithinWatermark path, as an oracle-checkable kept/
    * dropped census per type. The first-wins window is (user, type,
    * window)-partitioned; the epoch bucket is integer `floor(epoch) div
    * 300`, identical in both engines. */
  def qWindowDedup(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), col("wb"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        expr("unix_timestamp(ts) div 300").as("wb"))
      .withColumn("rn", row_number().over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .select(col("event_type"), col("n_events"), col("n_kept"),
        expr("((n_events - n_kept) * 1000) div n_events").as("drop_permille"))
      .transform(ps(col("event_type")))
  }

  /** Revenue concentration (Pareto point): the smallest top-customer
    * prefix holding ≥ 80% of order revenue — reported as customer count,
    * its corpus share, and the revenue share actually reached. Composes
    * BOTH scalable numbering operators: revenue-descending global rank via
    * [[graft.operators.Ops.globalRowNumberScalable]] and the cumulative
    * sum via [[graft.operators.Ops.prefixSumScalable]] — no single-task
    * window touches the |customers|-sized frame; the 80% cut is the
    * integer test `5·cum ≥ 4·total`. */
  def qPareto(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(s, d).groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("cents"))
    val ranked = Ops.globalRowNumberScalable(
        cust.withColumn("neg", -col("cents")), "neg", Seq("o_custkey"), "rank")
      .drop("neg")
    val withCum = Ops.prefixSumScalable(ranked, "rank", "cents", "cum_excl")
    val tot = cust.agg(sum(col("cents")).as("total_cents"),
      count(lit(1)).as("n_customers"))
    withCum.crossJoin(broadcast(tot))
      .withColumn("cum", col("cum_excl") + col("cents"))
      .where(col("cum") * 5 >= col("total_cents") * 4)
      .orderBy("rank")
      .limit(1)
      .select(col("rank").as("top_customers"), col("n_customers"),
        expr(ppmDiv("cum", "total_cents")).as("share_ppm"),
        expr("(rank * 1000000) div n_customers").as("pct_customers_ppm"))
  }

  /** Document novelty: per doc, the share of its distinct 3-shingles whose
    * FIRST corpus occurrence (min doc_id) is this doc — the
    * contribution-of-new-content metric a curation pass ranks by
    * (near-dups score ≈ 0 against their earlier twin). Two shingle-keyed
    * map-side-combinable aggregates + one join that reuses the shingle
    * hash partitioning; no windows, no pair expansion. */
  def qDocNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 3)
      .distinct()
    val first = sh.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("(n_novel * 1000) div n_shingles").as("novelty_permille"))
      .orderBy("doc_id")
  }

  /** Traffic burstiness per event type: the Fano factor (variance/mean) of
    * events-per-hour, from integer power sums over the bounded
    * (type × hour) grid — `((n·Σx² − (Σx)²) · 10⁶) div (n · Σx)` with
    * population variance, all-long arithmetic (x = hourly count ≤ total
    * events; sums over ≤ 24·31 buckets). ≫ 10⁶ means bursty, ≈ 10⁶
    * Poisson-like, ≪ 10⁶ regular — the traffic-shape classifier.
    * HEADROOM: exact while `n_hours·Σx²·10⁶` fits a long — hourly counts
    * to ~10⁶, i.e. billions of events per type-month. */
  def qBurstiness(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("n_events"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_hours"), col("n_events"),
        expr("((n_hours * sxx - n_events * n_events) * 1000000) div (n_hours * n_events)")
          .as("fano_ppm"))
      .transform(ps(col("event_type")))
  }

  /** Equi-height histogram boundaries for the optimizer-stats use case
    * (ANALYZE TABLE): the 8 exact order-statistic bucket upper bounds of
    * lineitem price cents, each the `⌈i·n/8⌉`-th smallest value via
    * [[graft.operators.Ops.globalRowNumberScalable]] — integer ranks, no
    * interpolation, no single-task window over the fact table; the 8
    * boundary ranks are selected with a broadcast join against a
    * range(1..8)-built frame. */
  def qEquiHeight(s: SparkSession, d: String): DataFrame = {
    val cents = Tables.lineitem(s, d)
      .select(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"))
    val n = cents.count()
    val ranked = Ops.globalRowNumberScalable(cents, "c", Seq("c"), "rank")
    val targets = s.range(1, 9)
      .select(col("id").as("bucket"), expr(s"(id * $n + 7) div 8").as("target"))
    ranked.join(broadcast(targets), col("rank") === col("target"))
      .groupBy("bucket")
      .agg(min(col("c")).as("upper_cents"), min(col("target")).as("rank_at"))
      .transform(ps(col("bucket")))
  }

  /** Funnel conversion latency: among users completing the
    * view→click→purchase funnel ([[graft.operators.EventAnalytics
    * .funnelStages]] — ONE actor-keyed shuffle), the p25/p50/p90 of
    * view-to-purchase seconds. Latencies are exact integer seconds
    * (epoch-floor subtraction); the percentile is the pinned exact
    * distributed interpolation, rounded for presentation. */
  def qConversionTime(s: SparkSession, d: String): DataFrame =
    EventAnalytics.funnelStages(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id", Seq("view", "click", "purchase"))
      .where(col("t3").isNotNull)
      .select((unix_timestamp(col("t3")) - unix_timestamp(col("t1"))).as("secs"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(secs, 0.25)"), 2).as("p25"),
        round(expr("percentile(secs, 0.5)"), 2).as("p50"),
        round(expr("percentile(secs, 0.9)"), 2).as("p90"))

  /** Clamped-at-zero running balance (inventory / credit-ledger / queue
    * semantics) in ONE window pass. The Lindley recurrence
    * `B_n = max(0, B_{n-1} + x_n)` looks inherently sequential, but has
    * the closed form `B_n = P_n − min(0, min_{k≤n} P_k)` over prefix sums
    * `P` — so the stateful fold becomes two window aggregates (running
    * sum + running min of that sum) over the SAME (user, ts) sort: one
    * exchange, one sort, no mapGroups state, growing frames only (never
    * the O(rows²) UnboundedFollowing re-scan). Deltas are signed integer
    * cents (credits for signup/purchase, debits otherwise) — exact at any
    * scale; per-user partitions keep the window distributed. */
  def qClampedBalance(s: SparkSession, d: String): DataFrame =
    Ops.clampedRunningBalance(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("CASE WHEN event_type IN ('signup', 'purchase') " +
              "THEN CAST(round(value * 100, 0) AS BIGINT) " +
              "ELSE -CAST(round(value * 100, 0) AS BIGINT) END").as("delta")),
        "user_id", Seq(col("ts"), col("event_id")), "delta", "balance")
      .select(col("user_id"), col("event_id"), col("delta"), col("balance"))
      .orderBy("user_id", "event_id")

  /** EWMA (α = ½) per user as an 8-tap FIR filter: the IIR recurrence is
    * truncated at 8 lags so the smoother becomes a STATELESS window
    * expression — 8 `lag()` taps sharing one window sort, with
    * power-of-two weights 2⁷‥2⁰ keeping everything integer-exact (Q8
    * fixed point: ewma ≈ ewma_q8 / 2⁸; truncation error ≤ 2⁻⁸ of the
    * oldest mass). One exchange + one sort per user partition; headroom
    * cents·2⁷·8 ≈ 10¹² per row even at 100 TB event volumes. */
  def qEwmaDecay(s: SparkSession, d: String): DataFrame =
    Ops.firEwma(
        Tables.events(s, d)
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "user_id", Seq(col("ts"), col("event_id")), "cents", 8, "ewma_q8")
      .select(col("user_id"), col("event_id"), col("cents"), col("ewma_q8"))
      .orderBy("user_id", "event_id")

  /** Trailing-7-day rolling correlation between daily revenue (whole
    * dollars) and daily order count per priority. The five moment sums
    * (Σx, Σy, Σx², Σxy, Σy²) are exact BIGINTs over a 7-ROW frame —
    * bounded frames re-scan ≤ 7 rows per output, one exchange + sort per
    * priority — and the single r² division happens once at the very end
    * in doubles with the identical expression shape in both engines
    * (signed by the covariance, rounded to 6; zero-variance frames →
    * NULL). Headroom: dollars/day ≤ 3·10⁹ keeps 7·x² < 2⁶³ — past that,
    * de-scale the unit, not the algorithm. */
  def qRollingCorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice, 0) AS BIGINT)")).as("x"),
        count(lit(1)).as("y"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    // all six frame aggregates in ONE select — interleaving them through
    // withColumn inserts Projects that defeat CollapseWindow and plan six
    // stacked Window nodes instead of one
    daily
      .select(col("o_orderpriority"), col("day"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"),
        sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("x") * col("y")).over(w).as("sxy"),
        sum(col("y") * col("y")).over(w).as("syy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("d1", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("d2", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("o_orderpriority"), col("day"), col("n"),
        col("num"), col("d1"), col("d2"),
        expr("CASE WHEN d1 = 0 OR d2 = 0 THEN NULL " +
          "WHEN num < 0 THEN -round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) / " +
          "(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)), 6) " +
          "ELSE round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) / " +
          "(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)), 6) END").as("signed_r2"))
      .orderBy("o_orderpriority", "day")
  }

  /** One PageRank superstep over the ≥2-co-ordered part graph (damping
    * 0.85, unnormalized start rank 10⁶ per node): `rank' = 150000 +
    * (85·Σ_{u→v} (10⁶ div deg_u)) div 100`, all deterministic integer
    * truncation. Execution is the standard relational PageRank step —
    * symmetric edge expansion, one degree aggregate joined back, one
    * contribution shuffle keyed by destination — with top-20 via
    * TakeOrdered (ties broken by part key). Iterating at scale = looping
    * this plan with localCheckpoint between supersteps, exactly the
    * [[graft.operators.TextOps.minHashDedupMap]] connected-components
    * discipline. Headroom: 85·Σcontrib ≤ 85·deg·10⁶ < 2⁶³ up to 10¹¹
    * neighbors per node. */
  def qPagerankStep(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("pa", "pb")
    val sym = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    sym.join(deg, Seq("src"))
      .select(col("dst"), expr("1000000 div deg").as("contrib"))
      .groupBy(col("dst")).agg(sum(col("contrib")).as("sc"))
      .select(col("dst").as("l_partkey"),
        (lit(150000L) + expr("(85 * sc) div 100")).as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("l_partkey")).limit(20)
  }

  /** One synchronous label-propagation superstep over the ≥2-co-ordered
    * part graph, seeded with the part's brand: each node adopts the most
    * frequent neighbor label (ties → lexicographically smallest) — the
    * community-detection LPA step as pure relational ops. The bounded
    * brand dim broadcasts onto the edge stream twice (neighbor label,
    * old label); the vote count is ONE map-side-combinable (dst, label)
    * aggregate and the argmax a dst-partitioned window — no collect, no
    * driver state. Iterating = looping this plan with localCheckpoint,
    * the minhash-CC discipline. */
  def qLabelProp(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("pa", "pb")
    val sym = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
    val lbl = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    val votes = sym
      .join(broadcast(lbl.select(col("p_partkey").as("src"),
        col("p_brand").as("nlabel"))), Seq("src"))
      .groupBy(col("dst"), col("nlabel")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("votes").desc, col("nlabel"))
    votes.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .join(broadcast(lbl.select(col("p_partkey").as("dst"),
        col("p_brand").as("old_label"))), Seq("dst"))
      .select(col("dst").as("l_partkey"), col("old_label"),
        col("nlabel").as("new_label"), col("votes"),
        when(col("old_label") === col("nlabel"), 0L).otherwise(1L).as("changed"))
      .orderBy("l_partkey")
  }

  /** Search-index build: the top-5 posting entries per token ranked by
    * (tf desc, doc_id), with the full posting length carried alongside —
    * the inverted-index materialization step of a retrieval pipeline.
    * Two shuffles total: the (doc, token) tf aggregate (map-side
    * combinable) and the token-keyed ranking window; posting length is a
    * second window aggregate over the SAME token partitioning (stacked
    * on one exchange + sort). Token keys are high-cardinality, so the
    * window parallelizes; output is ≤ 5·|vocab| rows at any corpus
    * scale. */
  def qInvertedIndex(s: SparkSession, d: String): DataFrame = {
    val tf = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
      .groupBy(col("shingle").as("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val wRank = Window.partitionBy(col("token"))
      .orderBy(col("tf").desc, col("doc_id"))
    val wAll = Window.partitionBy(col("token"))
    tf.select(col("token"), col("doc_id"), col("tf"),
        row_number().over(wRank).cast("long").as("pos"),
        count(lit(1)).over(wAll).as("posting_len"))
      .where(col("pos") <= 5)
      .orderBy("token", "pos")
  }

  /** Exact heavy hitters over the document token stream at support 1/200
    * via [[graft.operators.Ops.heavyHitters]] — per-partition Misra-Gries
    * summaries (k = 400 counters, bounded memory) whose survivor union
    * provably contains every token at the threshold, then an exact
    * broadcast-restricted re-count. The declared result is the EXACT set
    * `cnt·200 ≥ N` (partition-independent; the sketch only prunes the
    * key space), so the oracle is the plain HAVING aggregate. At 100 TB
    * this shape replaces a full token-vocabulary shuffle with a
    * candidates·partitions one. */
  def qHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
      .select(col("shingle").as("token"))
    Ops.heavyHitters(toks, "token", 200, 400)
      .select(col("token"), col("cnt"), col("total"),
        expr(ppmDiv("cnt", "total")).as("share_ppm"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Exact connected components of the co-purchase graph
    * ([[graft.operators.Graph.connectedComponents]] — min-label
    * propagation + pointer jumping, O(log n) rounds, localCheckpoint per
    * round), labeled with component sizes. The fixpoint (min node id per
    * component) is unique, so the output is deterministic; the oracle
    * states the same components as a recursive-CTE transitive closure —
    * quadratic in component size and only viable at oracle scale, which
    * is exactly the point of shipping the relational-iteration form. */
  def qGraphComponents(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("pa", "pb")
    val cc = Graph.connectedComponents(e, "pa", "pb")
    val sizes = cc.groupBy("component").agg(count(lit(1)).as("csize"))
    cc.join(sizes, Seq("component"))
      .select(col("node").as("l_partkey"), col("component"), col("csize"))
      .orderBy("l_partkey")
  }

  /** Referential-integrity audit over every FK relation in the star
    * schema: child rows, orphan rows (no parent), orphan ppm — each
    * relation ONE left-join + conditional-count pass (never a separate
    * anti-join re-scan), dims broadcast, fact relations shuffled once on
    * the FK. Bounded output (one row per declared relation) makes this
    * the load-verification primitive that runs after every 100 TB bulk
    * append. */
  def qFkAudit(s: SparkSession, d: String): DataFrame = {
    def rel(name: String, child: DataFrame, fk: String,
            parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
      val p = parent.select(col(pk).as("__pk")).distinct()
      child.select(col(fk).as("__fk"))
        .join(if (bcast) broadcast(p) else p, col("__fk") === col("__pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphan"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphan"),
          expr(ppmDiv("n_orphan", "n_child")).as("orphan_ppm"))
    }
    rel("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", bcast = true)
      .unionAll(rel("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey", bcast = false))
      .unionAll(rel("lineitem->part", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey", bcast = true))
      .unionAll(rel("lineitem->supplier", Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey", bcast = true))
      .unionAll(rel("customer->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey", bcast = true))
      .unionAll(rel("supplier->nation", Tables.supplier(s, d), "s_nationkey",
        Tables.nation(s, d), "n_nationkey", bcast = true))
      .orderBy("relation")
  }

  /** Join-key skew profile for the lineitem→orders shuffle key: the
    * top-20 heaviest keys with their row share, plus the global skew
    * factor `max_cnt·n_keys div n_rows` (1 000 000 = perfectly uniform)
    * carried on every row. This is the diagnostic that decides salting /
    * AQE skew-join thresholds BEFORE a 100 TB shuffle: one map-side
    * combinable count, top-20 via TakeOrdered, the two scalar baselines
    * broadcast back. */
  def qSkewProfile(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    val base = cnt.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    cnt.crossJoin(broadcast(base))
      .select(col("l_orderkey"), col("cnt"), col("n_keys"), col("n_rows"),
        expr(ppmDiv("cnt", "n_rows")).as("share_ppm"),
        expr("(max_cnt * n_keys * 1000000) div n_rows").as("skew_factor_ppm"))
      .orderBy(col("cnt").desc, col("l_orderkey")).limit(20)
  }

  /** ANALYZE-style column statistics — the `ANALYZE TABLE ... FOR
    * COLUMNS` pass that feeds a cost-based optimizer: per column, row
    * count, null count, EXACT distinct count, and min/max rendered as
    * strings (doubles excluded by design — their string rendering is the
    * one engine-divergent surface; dates pass through a `date` cast so
    * both engines print ISO). TWO aggregate passes deliberately: the
    * multi-count-distinct plans as one Expand (+1 stream per column,
    * map-side partials), and MIXING the 19 regular aggregates into that
    * same aggregate forces them through every Expand stream (measured
    * 7× slower than the split form at sf0.1); the min/max/null pass is a
    * plain 1-row aggregate, and the two 1-row results combine in a
    * broadcast nest. Both scans read only the 6 stat columns. At extreme
    * scale the approximate path is [[qApproxDistinct]]'s HLL. Output is
    * |columns| rows at any data size. */
  def qNdvStats(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus")
    val render: Map[String, String] =
      (cols.map(c => c -> c) :+ ("l_shipdate" -> "CAST(l_shipdate AS DATE)")).toMap
    val all = cols :+ "l_shipdate"
    val li = Tables.lineitem(s, d)
    val ndvAggs = all.map(c => countDistinct(expr(render(c))).as(s"nd_$c"))
    val ndvs = li.agg(ndvAggs.head, ndvAggs.tail: _*)
    val mmAggs =
      all.map(c => sum(when(expr(render(c)).isNull, 1L).otherwise(0L)).as(s"nn_$c")) ++:
      all.map(c => min(expr(render(c))).cast("string").as(s"mn_$c")) ++:
      all.map(c => max(expr(render(c))).cast("string").as(s"mx_$c"))
    val mm = li.agg(count(lit(1)).as("n_rows"), mmAggs: _*)
    val stackArgs = all.map(c =>
      s"'$c', n_rows, nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    ndvs.crossJoin(broadcast(mm))
      .selectExpr(s"stack(${all.size}, $stackArgs) AS " +
        "(col, n_rows, n_nulls, ndv, min_val, max_val)")
      .transform(ps(col("col")))
  }

  /** Dataset datasheet ("dataset card") per source: docs, empty docs,
    * token totals, distinct token types, mean tokens/doc (ppm), distinct
    * languages — the curation summary a training-data release ships
    * with. Two map-side-combinable aggregation passes (doc grain, then
    * token-type grain) merged on the bounded source key; nothing here
    * exceeds |sources| rows after the partials. */
  def qDatasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val docStats = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(Ops.normalizeText(col("text")) === "", 1L).otherwise(0L))
        .as("n_empty"),
      count_distinct(col("lang")).as("n_langs"))
    // tokens carry `source` straight out of the scan (row-local explode) —
    // never a doc_id join back onto the token stream
    val tok = docs.select(col("source"),
      explode(graft.functions.Shingles.shingles(
        Ops.normalizeText(col("text")), 1)).as("shingle"))
    val tokStats = tok.groupBy(col("source"), col("shingle"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("total_tokens"), count(lit(1)).as("n_types"))
    docStats.join(tokStats, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_empty"), col("n_langs"),
        coalesce(col("total_tokens"), lit(0L)).as("total_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        expr(ppmDiv("coalesce(total_tokens, 0)", "n_docs")).as("mean_len_ppm"))
      .transform(ps(col("source")))
  }

  /** BFS distance layers from the highest-degree node of the co-purchase
    * graph (hop cap 15 — the declared semantics is `min distance ≤ 15`,
    * identically stated by the oracle's depth-capped recursive CTE).
    * Distance relaxation `d(v) := min(d(v), min_u d(u)+1)` as one
    * map-side-combinable aggregate per round with localCheckpoint
    * lineage truncation; the convergence check is fused into that same
    * materialization as a `Dataset.observe` changed-counter (one job per
    * round — the [[operators.Graph.connectedComponents]] discipline,
    * including its cluster-mode reliable-checkpoint note). The 1-row
    * seed (max degree, min node tie-break) rides a broadcast — the
    * driver never sees node data. Unreached nodes are excluded. */
  def qBfsLevels(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("pa", "pb")
    val sym = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
      .transform(Checkpoints.truncate)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val seed = deg.orderBy(col("deg").desc, col("src")).limit(1)
      .select(col("src").as("node"), lit(0L).as("sd"))
    var dist = sym.select(col("src").as("node")).distinct()
      .join(broadcast(seed), Seq("node"), "left")
      .select(col("node"), col("sd").as("d"))
      .transform(Checkpoints.truncate)
    // empty-graph guard (one limit-1 job): AQE's empty-relation propagation
    // can eliminate a CollectMetrics node on a provably-empty plan, which
    // would block the fused Observation below forever
    var changed = if (dist.isEmpty) 0L else 1L
    var iter = 0
    while (changed > 0 && iter < 15) {
      val relaxed = sym
        .join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .where(col("d").isNotNull)
        .groupBy(col("dst").as("node")).agg(min(col("d") + 1).as("nd"))
      // fused convergence check: the changed-count is an observed metric
      // on the SAME plan the eager localCheckpoint materializes — one job
      // per round, never checkpoint + count (distances only tighten, so a
      // null-safe ≠ against the carried prev is exactly "progress")
      val obs = org.apache.spark.sql.Observation()
      val next = dist.join(relaxed, Seq("node"), "left")
        .select(col("node"), col("d").as("prev"),
          least(col("d"), col("nd")).as("d"))
        .observe(obs, sum(when(!(col("d") <=> col("prev")), 1L)
          .otherwise(0L)).as("changed"))
        .select(col("node"), col("d"))
        .transform(Checkpoints.truncate)
      changed = obs.get.getOrElse("changed", 0L) match {
        case null => 0L
        case x => x.asInstanceOf[Long]
      }
      dist.unpersist()
      dist = next
      iter += 1
    }
    sym.unpersist()
    dist.where(col("d").isNotNull)
      .select(col("node").as("l_partkey"), col("d").as("level"))
      .orderBy("l_partkey")
  }

  /** Deterministic A/B experiment readout: users split into two arms by
    * the portable Knuth multiplicative hash (engine-independent, no RNG
    * state), per-arm conversion (≥ 14 purchase events — a threshold the
    * fixture doesn't saturate) as exact integer counts and ppm rates,
    * and the 2×2 chi-square statistic computed ONCE at the end in
    * doubles with the identical expression in both engines. One
    * user-keyed aggregate (map-side combinable max) then a 4-cell
    * aggregate — the readout is O(1) output at any event volume. */
  def qAbtestChi2(s: SparkSession, d: String): DataFrame = {
    val arms = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .geq(14), 1L).otherwise(0L).as("converted"))
      .withColumn("arm",
        expr("((user_id % 2147483648) * 2654435761) % 4294967296 % 2"))
    arms.agg(
        sum(when(col("arm") === 0 && col("converted") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("arm") === 0 && col("converted") === 1, 1L).otherwise(0L)).as("b"),
        sum(when(col("arm") === 1 && col("converted") === 0, 1L).otherwise(0L)).as("c"),
        sum(when(col("arm") === 1 && col("converted") === 1, 1L).otherwise(0L)).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        expr(ppmDiv("b", "(a + b)")).as("rate0_ppm"),
        expr(ppmDiv("d", "(c + d)")).as("rate1_ppm"),
        expr("CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0 THEN NULL " +
          "ELSE round(((a + b + c + d) * pow(CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c, 2)) / " +
          "((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d) * " +
          "(CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)), 4) END").as("chi2"))
  }

  /** Prefix-duplicate detection: documents grouped by the md5 of their
    * first 16 normalized tokens — the cheap linear pass that catches
    * boilerplate-prefix and truncated-copy near-dups that full-text
    * fingerprints miss. One hash-partitioned window over the prefix
    * fingerprint (same discipline as [[qExactDedup]]); emits only
    * multi-member groups with the canonical (min) doc and group size. */
  def qPrefixDup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("pfp"))
    Tables.documents(s, d)
      .select(col("doc_id"), Ops.normalizeText(col("text")).as("t"))
      .where(col("t") =!= "")
      .select(col("doc_id"),
        md5(array_join(slice(split(col("t"), " "), 1, 16), " ")).as("pfp"))
      .select(col("doc_id"), col("pfp"),
        min(col("doc_id")).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("grp_size"))
      .where(col("grp_size") >= 2)
      .select(col("doc_id"), col("canonical_id"), col("grp_size"))
      .orderBy("doc_id")
  }

  /** Asymmetric containment dedup: pairs where ≥ 60% of the SMALLER
    * document's token set appears in the larger one — the
    * quote/excerpt/truncation case symmetric Jaccard under-scores. Same
    * df-capped posting-list expansion as [[qNgramJaccard]] (bounded
    * in-bucket pairs, no self-join), with the exact integer containment
    * `c·10⁶ div min(na, nb)` and a strict-size asymmetry filter. */
  def qContainment(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).where(col("doc_id") % 50 === 0)
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(split(Ops.normalizeText(col("text")), " ")).as("token"))
      .where(col("token") =!= "").distinct()
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dft = tok.groupBy("lang", "token").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 1000))
    val inter = tok.join(dft.select("lang", "token"), Seq("lang", "token"))
      .groupBy("lang", "token")
      .agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"))
    inter
      .join(sz.select(col("doc_id").as("id_a"), col("sz").as("na")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("sz").as("nb")), "id_b")
      .where(col("na") =!= col("nb"))
      .select(col("id_a"), col("id_b"), col("c"), col("na"), col("nb"),
        expr(ppmDiv("c", "least(na, nb)")).as("containment_ppm"))
      .where(col("containment_ppm") >= 600000)
      .orderBy("id_a", "id_b")
  }

  /** Mann-Kendall trend test per order priority, entirely in exact
    * integers: monthly revenue cents first (map-side combinable, bounded
    * by the calendar), then the S statistic `Σ_{i<j} sign(x_j − x_i)`
    * with concordant/discordant/tie counts from the in-priority month
    * pair join — pairs are CALENDAR-bounded (months², independent of row
    * volume), so the quadratic stays O(1) at any data scale while the
    * scan stays linear. The classic nonparametric "is revenue trending"
    * readout, no distributional assumption, no floats. */
  def qMannKendall(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
    monthly.as("i")
      .join(monthly.as("j"), col("i.o_orderpriority") === col("j.o_orderpriority") &&
        col("i.ym") < col("j.ym"))
      .groupBy(col("i.o_orderpriority").as("o_orderpriority"))
      .agg(
        sum(expr("CAST(sign(j.x - i.x) AS BIGINT)")).as("s_stat"),
        sum(when(col("j.x") > col("i.x"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("j.x") < col("i.x"), 1L).otherwise(0L)).as("discordant"),
        sum(when(col("j.x") === col("i.x"), 1L).otherwise(0L)).as("ties"),
        (count(lit(1))).as("n_pairs"))
      .transform(ps(col("o_orderpriority")))
  }

  /** Incremental-ingest dedup: a NEW document batch (odd doc ids)
    * checked against the EXISTING corpus (even ids) by whole-text
    * fingerprint — the nightly-append primitive: `dup_of_corpus` from a
    * left join onto the corpus fingerprint index (min existing doc as
    * canonical), `dup_in_batch` from a first-wins window WITHIN the
    * batch. Both sides hash-partition on the fingerprint — one co-keyed
    * exchange each, no full-corpus rescan of anything but the bounded
    * fingerprint column. */
  def qIncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    val corpus = fp.where(col("doc_id") % 2 === 0)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("corpus_canonical"))
    val batch = fp.where(col("doc_id") % 2 === 1)
    val w = Window.partitionBy(col("fp"))
    batch
      .withColumn("batch_first", min(col("doc_id")).over(w))
      .join(corpus, Seq("fp"), "left")
      .select(col("doc_id"),
        col("corpus_canonical"),
        when(col("corpus_canonical").isNotNull, 1L).otherwise(0L).as("dup_of_corpus"),
        when(col("doc_id") =!= col("batch_first"), 1L).otherwise(0L).as("dup_in_batch"))
      .orderBy("doc_id")
  }

  /** Last-observation-carried-forward imputation (LOCF): every event
    * annotated with its user's most recent PURCHASE value at that point
    * in time (null before the first purchase) — the sparse-feature
    * forward-fill of a training-data pipeline. `last(…, ignoreNulls)`
    * over a growing frame: one exchange + one sort per user, never the
    * O(rows²) following-frame scan; the value passes through untouched
    * (bit-identical doubles from the shared parquet). */
  def qLocfImpute(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
          .over(w).as("last_purchase_value"))
      .orderBy("user_id", "event_id")
  }

  /** TPC-H Q5 shape — local-supplier revenue per ASIA nation for 1997
    * orders: the full six-table star join with the co-nationality
    * constraint (customer and supplier in the SAME nation). All dims
    * (region→nation→customer key set, supplier) broadcast; the only
    * fact-fact shuffle is lineitem⋈orders on the order key; revenue is
    * exact integer cent-percents `price_c·(100−disc_pct)`. The classic
    * join-order stress test: Catalyst must push the region filter
    * through two dims before any fact touches the plan. */
  def qRegionalRevenue(s: SparkSession, d: String): DataFrame = {
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate") < lit("1998-01-01").cast("date"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))").as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaNations.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("revenue_cp"), count(lit(1)).as("n_lines"))
      .transform(ps(col("n_name")))
  }

  /** TPC-H Q10 shape — top-20 customers by revenue lost to returns
    * (returnflag R) among 1997-H1 orders, with their nation. Exact
    * integer cent-percent revenue; customer and nation dims broadcast
    * onto the one lineitem⋈orders shuffle; the bounded top-20 ranks by
    * TakeOrdered (revenue desc, custkey tie-break), never a global
    * sort. */
  def qReturnedCustomers(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-07-01").cast("date"))
      .select(col("o_orderkey"), col("o_custkey"))
    val rev = Tables.lineitem(s, d)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))").as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("rev")).as("revenue_cp"))
    rev
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue_cp"))
      .orderBy(col("revenue_cp").desc, col("c_custkey")).limit(20)
  }

  /** TPC-H Q14 shape — promotional revenue share for 1997 shipments:
    * `promo_rev·10⁶ div total_rev` from two conditional sums in ONE
    * aggregate pass over the part-joined lineitem (part dim broadcast,
    * shipdate pushed to the scan). O(1) output; the share is the exact
    * two-step ppm division. */
  def qPromoShare(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))").as("rev"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L)).as("promo_cp"),
        sum(col("rev")).as("total_cp"))
      .select(col("promo_cp"), col("total_cp"),
        expr(ppmDiv("promo_cp", "total_cp")).as("promo_share_ppm"))

  /** Time-boxed funnel census: users completing view→click→purchase with
    * EACH step within 7 days of the previous
    * ([[graft.operators.EventAnalytics.funnelStagesWithin]] — one
    * actor-keyed shuffle, K-slot row-local fold, exact
    * timestamp+interval deadlines). The oracle states the equivalent
    * nested bounded-min joins; output is the O(1) per-stage completion
    * count. */
  def qFunnelBounded(s: SparkSession, d: String): DataFrame =
    EventAnalytics.funnelStagesWithin(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id",
        Seq("view", "click", "purchase"), 7L * 86400L)
      .agg(count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_7d"),
        count(col("t3")).as("n_purchase_7d"))

  /** Per-user discovery curve: how many DISTINCT event types the user
    * has seen up to each event — the scalable form of a running
    * COUNT(DISTINCT) window (which Spark rightly refuses): a
    * first-occurrence flag from a (user, type)-keyed row_number window,
    * then a running sum of flags over the (user)-keyed time order. Two
    * exchanges, both high-cardinality-keyed; state per row is one bit,
    * never a per-row distinct set. */
  def qDiscoveryCurve(s: SparkSession, d: String): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L).as("is_first"))
      .withColumn("types_seen", sum(col("is_first")).over(wRun))
      .select(col("user_id"), col("event_id"), col("types_seen"))
      .orderBy("user_id", "event_id")
  }

  /** Zone-map build: per 500-order batch (scalable two-phase global
    * numbering, no single-task window), the min/max order key, date
    * span, and cent range plus row count — the data-skipping statistics
    * a 100 TB table layout maintains per file/row-group so point and
    * range scans can prune without reading data. */
  def qZoneMap(s: SparkSession, d: String): DataFrame =
    Ops.batchAssignScalable(
        Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("day"),
          expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents")),
        "o_orderkey", 500)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy("batch_id")

  /** Class-balanced undersampling: every event_type capped at the
    * MINORITY class size, members chosen by the deterministic Knuth-hash
    * order (portable, seedable, no RNG state) — the imbalance fix before
    * training a classifier. The bounded per-class count table and its
    * min ride a broadcast; selection is one class-keyed ranking window
    * over the hash order. Emits the per-class census (kept = min class
    * size for every class — the balance proof). */
  def qBalancedSample(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("h",
        expr("((event_id % 2147483648) * 2654435761) % 4294967296"))
    val minN = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("cap"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    ev.crossJoin(broadcast(minN))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("cap"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("kept"), min(col("cap")).as("cap"),
        sum(col("h")).as("h_sum"))
      .transform(ps(col("event_type")))
  }

  /** Dedup yield report per source: documents in, unique fingerprints,
    * duplicate rows and ppm — the before/after census a 100 TB dedup
    * pass publishes. One fingerprint-grain aggregate (map-side
    * combinable count) re-aggregated to the bounded source key; the
    * fingerprint never leaves its hash partition unreduced. */
  def qDedupReport(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy(col("source"), col("fp")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_unique"),
        (sum(col("c")) - count(lit(1))).as("n_dups"))
      .select(col("source"), col("n_docs"), col("n_unique"), col("n_dups"),
        expr(ppmDiv("n_dups", "n_docs")).as("dup_ppm"))
      .transform(ps(col("source")))

  /** Theil–Sen robust trend per priority: the MEDIAN of all pairwise
    * monthly-revenue slopes, each slope lifted to the exact integer
    * surrogate `(Δcents·10⁶) div Δmonths` so the ranking is
    * engine-portable (no float ties). Pairs are calendar-bounded
    * (months², invariant to row volume); the median is the exact
    * (n+1)/2 order statistic by row_number — the breakdown-resistant
    * alternative to the least-squares slope of q_regr_trend. */
  def qTheilSen(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        ((year(col("o_orderdate")) * 12) + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
    val slopes = monthly.as("i")
      .join(monthly.as("j"), col("i.o_orderpriority") === col("j.o_orderpriority") &&
        col("i.m") < col("j.m"))
      .select(col("i.o_orderpriority").as("o_orderpriority"),
        expr(scaledDiv("(j.x - i.x)", "(j.m - i.m)", 1000L, 1000L)).as("slope"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("slope"), col("o_orderpriority"))
    slopes
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .where(col("rk") === expr("(n + 1) div 2"))
      .select(col("o_orderpriority"), col("slope").as("theil_sen_slope"),
        col("n").as("n_pairs"), col("rk").as("median_rank"))
      .transform(ps(col("o_orderpriority")))
  }

  /** Lag-1 autocorrelation of monthly revenue per priority from exact
    * BIGINT moment sums over the lag-paired series (one lag window +
    * one bounded aggregate; the single Pearson division happens at the
    * end in doubles with the identical expression both engines) — the
    * "is this series momentum or noise" readout. Calendar-bounded
    * state; the scan stays one linear map-side aggregate. Units are
    * HUNDRED-dollar buckets (cents div 10⁴): `n·Σx²` must stay under
    * 2⁶³, and the coarse unit buys headroom to ~10¹² of monthly revenue
    * where cents would overflow at ~10⁷ (caught live by ANSI mode). */
  def qAutocorr(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(expr("sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) div 10000")
        .as("x"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("ym"))
    monthly
      .withColumn("xp", lag(col("x"), 1).over(w))
      .where(col("xp").isNotNull)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("xp")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("xp") * col("xp")).as("syy"),
        sum(col("x") * col("xp")).as("sxy"))
      .select(col("o_orderpriority"), col("n"),
        expr("n * sxy - sx * sy").as("num"),
        expr("n * sxx - sx * sx").as("d1"),
        expr("n * syy - sy * sy").as("d2"),
        expr("CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL " +
          "ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)) / " +
          "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) END")
          .as("r1"))
      .transform(ps(col("o_orderpriority")))
  }

  /** Wald–Wolfowitz runs test inputs per priority: monthly revenue
    * classified above/below its per-priority MEDIAN (exact (n+1)/2
    * order statistic — no float percentile), then maximal same-side
    * runs counted as sign-change transitions + 1 via a lag window.
    * All exact integers over the calendar-bounded series; too many or
    * too few runs versus n⁺/n⁻ flags cycling or clustering. */
  def qRunsTest(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
    val wRank = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("x"), col("ym"))
    val wpart = Window.partitionBy(col("o_orderpriority"))
    val med = monthly
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wpart))
      .where(col("rk") === expr("(n + 1) div 2"))
      .select(col("o_orderpriority"), col("x").as("median_x"))
    val wTime = Window.partitionBy(col("o_orderpriority")).orderBy(col("ym"))
    monthly.join(broadcast(med), Seq("o_orderpriority"))
      .withColumn("side", when(col("x") > col("median_x"), 1L).otherwise(0L))
      .withColumn("prev", lag(col("side"), 1).over(wTime))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_months"),
        sum(col("side")).as("n_above"),
        (sum(when(col("prev").isNotNull && col("side") =!= col("prev"), 1L)
          .otherwise(0L)) + 1L).as("n_runs"))
      .transform(ps(col("o_orderpriority")))
  }

  /** Month-over-month revenue bridge (the BI waterfall): each month's
    * revenue change decomposed into NEW customers, REACTIVATED (gap >
    * 1 month), EXPANSION / CONTRACTION of returning customers vs their
    * prior month, and CHURN (prior-month actives gone this month) —
    * `Δrev = new + react + expansion − contraction − churn` holds
    * exactly in integer cents. One customer-keyed window (lag month,
    * lag cents, lead month — one Window node) over the (customer,
    * month) aggregate, then two calendar-bounded aggregates merged on
    * the month key. */
  def qRevenueBridge(s: SparkSession, d: String): DataFrame = {
    val cm = Tables.orders(s, d)
      .groupBy(col("o_custkey"),
        ((year(col("o_orderdate")) * 12) + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("m"))
    val e = cm.select(col("o_custkey"), col("m"), col("cents"),
      lag(col("m"), 1).over(w).as("pm"),
      lag(col("cents"), 1).over(w).as("pc"),
      lead(col("m"), 1).over(w).as("nm"))
    val inflow = e.groupBy(col("m")).agg(
      sum(col("cents")).as("total_cents"),
      sum(when(col("pm").isNull, col("cents")).otherwise(0L)).as("new_cents"),
      sum(when(col("pm").isNotNull && col("pm") < col("m") - 1, col("cents"))
        .otherwise(0L)).as("react_cents"),
      sum(when(col("pm") === col("m") - 1 && col("cents") > col("pc"),
        col("cents") - col("pc")).otherwise(0L)).as("expansion_cents"),
      sum(when(col("pm") === col("m") - 1 && col("cents") < col("pc"),
        col("pc") - col("cents")).otherwise(0L)).as("contraction_cents"))
    val churn = e.where(col("nm").isNull || col("nm") =!= col("m") + 1)
      .select((col("m") + 1).as("m"), col("cents"))
      .groupBy(col("m")).agg(sum(col("cents")).as("churn_cents"))
    inflow.join(churn, Seq("m"), "left")
      .select(col("m"), col("total_cents"), col("new_cents"),
        col("react_cents"), col("expansion_cents"), col("contraction_cents"),
        coalesce(col("churn_cents"), lit(0L)).as("churn_cents"))
      .orderBy("m")
  }

  /** Heterogeneous treatment readout: exact distributed order-value
    * percentiles PER Knuth-hash experiment arm (the q_abtest_chi2
    * assignment) — two bounded rows, the distributional companion to
    * the scalar conversion test. Percentiles ride the pinned exact
    * two-round selection ([[graft.operators.Ops.exactPercentiles]]) —
    * over INTEGER CENTS at binary-exact quartile fractions (.25/.5/.75),
    * so the interpolation `lo + frac·(hi−lo)` is bit-identical in any
    * IEEE engine (a p90-style 0.9·(n−1) fraction is NOT binary-exact
    * and can flip the last cent — caught live by the oracle). */
  def qAbQuantiles(s: SparkSession, d: String): DataFrame = {
    val armed = Tables.orders(s, d)
      .select(expr("((o_custkey % 2147483648) * 2654435761) % 4294967296 % 2")
        .as("arm"),
        expr("CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE)").as("v"))
    Ops.exactPercentiles(armed, Seq("arm"), "v",
        Seq(("p25_c", 0.25), ("p50_c", 0.5), ("p75_c", 0.75)))
      .select(col("arm"), round(col("p25_c"), 2).as("p25_c"),
        round(col("p50_c"), 2).as("p50_c"), round(col("p75_c"), 2).as("p75_c"))
      .transform(ps(col("arm")))
  }

  /** Session-duration histogram: 24h-gap sessions per user (the
    * sessionize semantics), span measured min→max event (exact integer
    * µs — gap padding excluded so the islands-reconstruction oracle
    * states the identical number), bucketed into power-of-2 minutes
    * (−1 = single-event sessions). Bounded output (≤ 1 + log₂ span
    * buckets); the only exchange is the user-session key. */
  def qSessionLengths(s: SparkSession, d: String): DataFrame = {
    val spans = Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "24 hours"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(expr("(unix_micros(t1) - unix_micros(t0)) div 60000000").as("mins"))
    val bucket = (0 to 20).foldLeft(lit(-1L)) { (acc, b) =>
      when(col("mins") >= (1L << b), lit(b.toLong)).otherwise(acc)
    }
    spans.select(bucket.as("len_bucket"))
      .groupBy("len_bucket").agg(count(lit(1)).as("n_sessions"))
      .transform(ps(col("len_bucket")))
  }

  /** Exact 7-day rolling MEDIAN of daily revenue per priority — the
    * robust rolling baseline a spiky series needs where the rolling
    * mean chases outliers. The bounded (≤7-row) frame makes the exact
    * form cheap: collect the frame into a row-local array, sort it,
    * take the (n+1)/2-th element — all integers, no percentile
    * interpolation, state bounded by the frame length at any scale. */
  def qRollingMedian(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    daily
      .withColumn("arr", sort_array(collect_list(col("x")).over(w)))
      .select(col("o_orderpriority"), col("day"),
        size(col("arr")).cast("long").as("n"),
        expr("element_at(arr, CAST((size(arr) + 1) div 2 AS INT))").as("med_cents"))
      .orderBy("o_orderpriority", "day")
  }

  /** Benford first-digit profile of order totals (in cents): digit
    * counts and ppm shares against the 30.1%/17.6%/… expectation — the
    * classic fabricated-data screen, here as a data-quality primitive.
    * The first digit comes from the decimal string (no float log10);
    * one map-side-combinable 9-row aggregate. */
  def qBenford(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.orders(s, d)
      .select(expr("CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) " +
        "AS STRING), 1, 1) AS BIGINT)").as("digit"))
      .where(col("digit") >= 1)
    val total = digits.agg(count(lit(1)).as("n_total"))
    digits.groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("cnt"), col("n_total"),
        expr(ppmDiv("cnt", "n_total")).as("share_ppm"))
      .transform(ps(col("digit")))
  }

  /** Cohort LTV curves: customers cohorted by FIRST-order month, then
    * cumulative revenue per (cohort, month-offset) cell — the
    * lifetime-value grid a subscription/commerce business reads
    * horizontally. The first-order month is one customer-keyed min;
    * the grid is calendar²-bounded, and the cumulative sum runs over
    * the bounded offsets within each cohort. All exact integer cents. */
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val om = Tables.orders(s, d)
      .select(col("o_custkey"),
        ((year(col("o_orderdate")) * 12) + month(col("o_orderdate")))
          .cast("long").as("m"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val cohort = om.groupBy(col("o_custkey")).agg(min(col("m")).as("c0"))
    val grid = om.join(cohort, Seq("o_custkey"))
      .groupBy(col("c0"), (col("m") - col("c0")).as("offset"))
      .agg(sum(col("cents")).as("cents"), count_distinct(col("o_custkey")).as("n_cust"))
    val w = Window.partitionBy(col("c0")).orderBy(col("offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .select(col("c0").as("cohort_m"), col("offset"), col("n_cust"),
        col("cents"), col("cum_cents"))
      .orderBy("cohort_m", "offset")
  }

  /** Weighted median unit price per return flag (weight = quantity) —
    * computed scalably by collapsing to the (flag, DISTINCT cents)
    * weight table FIRST (map-side combinable; the window then runs over
    * value cardinality, not row count) and taking the first value whose
    * doubled cumulative weight reaches the total (the weighted lower
    * median — rank crossing inside a tie run resolves to the same value
    * under any order, so the min aggregate is deterministic). */
  def qWeightedMedian(s: SparkSession, d: String): DataFrame = {
    val vw = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
      .agg(sum(expr("CAST(round(l_quantity, 0) AS BIGINT)")).as("wt"))
    val wOrd = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vw.withColumn("cum", sum(col("wt")).over(wOrd))
      .withColumn("wtot", sum(col("wt")).over(Window.partitionBy(col("l_returnflag"))))
      .where(col("cum") * 2 >= col("wtot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("cents")).as("wmed_cents"), min(col("wtot")).as("w_total"))
      .transform(ps(col("l_returnflag")))
  }

  /** 10%-trimmed mean price per return flag, exactly, without ranking
    * individual rows: collapse to the (flag, DISTINCT cents) count
    * table, then each value's kept multiplicity is the overlap of its
    * cumulative-rank interval with the kept band `(n/10, n − n/10]` —
    * `greatest(0, least(cum, hi) − greatest(cum − wt, lo))`. All
    * integer arithmetic to the final one-division mean; the robust-mean
    * companion to q_winsorize (drop vs clamp). */
  def qTrimmedMean(s: SparkSession, d: String): DataFrame = {
    val vc = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
      .agg(count(lit(1)).as("wt"))
    val wOrd = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vc.withColumn("cum", sum(col("wt")).over(wOrd))
      .withColumn("n", sum(col("wt")).over(Window.partitionBy(col("l_returnflag"))))
      .withColumn("lo", expr("n div 10"))
      .withColumn("hi", expr("n - n div 10"))
      .withColumn("kept",
        greatest(lit(0L), least(col("cum"), col("hi")) -
          greatest(col("cum") - col("wt"), col("lo"))))
      .groupBy(col("l_returnflag"))
      .agg(min(col("n")).as("n_rows"), min(expr("hi - lo")).as("n_kept"),
        sum(col("cents") * col("kept")).as("trimmed_sum"))
      .select(col("l_returnflag"), col("n_rows"), col("n_kept"),
        col("trimmed_sum"),
        (expr(roundDiv("trimmed_sum", "n_kept", 10000L)).cast("double") / 10000.0)
          .as("trimmed_mean"))
      .transform(ps(col("l_returnflag")))
  }

  /** Statistical MODE of the quantity column per return flag (most
    * frequent value, ties → smallest): one map-side value-collapse then
    * a flag-keyed argmax window over value cardinality — the
    * categorical/discrete summary mean and median miss. */
  def qModeStat(s: SparkSession, d: String): DataFrame = {
    val vc = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"),
        expr("CAST(round(l_quantity, 0) AS BIGINT)").as("qty"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("freq").desc, col("qty"))
    vc.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("l_returnflag"), col("qty").as("mode_qty"), col("freq"))
      .transform(ps(col("l_returnflag")))
  }

  /** IQR outlier census per return flag: exact Q1/Q3 as cumulative-rank
    * crossings over the DISTINCT-cents weight table (`4·cum ≥ n` /
    * `4·cum ≥ 3n` — no interpolation), Tukey fences at 1.5·IQR in pure
    * integer arithmetic (`2·cents < 2·q1 − 3·iqr`), and the outlier
    * counts from one broadcast join of the 3-row fence table back onto
    * the collapsed values. Never ranks an individual row. */
  def qIqrOutliers(s: SparkSession, d: String): DataFrame = {
    val vc = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
      .agg(count(lit(1)).as("wt"))
    val wOrd = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc
      .withColumn("cum", sum(col("wt")).over(wOrd))
      .withColumn("n", sum(col("wt")).over(Window.partitionBy(col("l_returnflag"))))
    val fences = cum.groupBy(col("l_returnflag"))
      .agg(min(when(col("cum") * 4 >= col("n"), col("cents"))).as("q1"),
        min(when(col("cum") * 4 >= col("n") * 3, col("cents"))).as("q3"),
        min(col("n")).as("n"))
      .withColumn("iqr", col("q3") - col("q1"))
    vc.join(broadcast(fences), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("q1")).as("q1"), min(col("q3")).as("q3"),
        min(col("n")).as("n_rows"),
        sum(when(col("cents") * 2 < col("q1") * 2 - col("iqr") * 3, col("wt"))
          .otherwise(0L)).as("n_low"),
        sum(when(col("cents") * 2 > col("q3") * 2 + col("iqr") * 3, col("wt"))
          .otherwise(0L)).as("n_high"))
      .transform(ps(col("l_returnflag")))
  }

  /** Calendar gap-filling with LINEAR interpolation: the daily revenue
    * series per priority densified over its full date span, missing
    * days filled as `prev + (next−prev)·(d−d_prev) div (d_next−d_prev)`
    * — exact integer interpolation between the nearest observed
    * neighbors (edges fall back to the available side). Both carries
    * are GROWING frames — forward on the day order, backward on the
    * REVERSE order — never the O(rows²) UnboundedFollowing re-scan; the
    * spine explodes from a 5-row span table. */
  def qGapInterp(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
    val spine = daily.groupBy(col("o_orderpriority"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("o_orderpriority"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wF = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = Window.partitionBy(col("o_orderpriority")).orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("o_orderpriority", "day"), "left")
      .withColumn("pv", last(col("x"), ignoreNulls = true).over(wF))
      .withColumn("pd", last(when(col("x").isNotNull, col("day")),
        ignoreNulls = true).over(wF))
      .withColumn("nv", last(col("x"), ignoreNulls = true).over(wB))
      .withColumn("nd", last(when(col("x").isNotNull, col("day")),
        ignoreNulls = true).over(wB))
      .select(col("o_orderpriority"), col("day"),
        when(col("x").isNotNull, 1L).otherwise(0L).as("observed"),
        when(col("x").isNotNull, col("x"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + expr(
            "((nv - pv) * CAST(datediff(day, pd) AS BIGINT)) div " +
              "CAST(datediff(nd, pd) AS BIGINT)"))
          .as("filled_cents"))
      .orderBy("o_orderpriority", "day")
  }

  /** Order-count distribution (TPC-H Q13 shape): how many customers
    * placed exactly k orders, INCLUDING the zero-order tail via a left
    * join from the customer universe onto the per-customer aggregate.
    * The heavy aggregate runs on orders alone (custkey-keyed, map-side
    * combinable); the distribution re-aggregate is bounded by the max
    * per-customer order count. */
  def qOrderCountDist(s: SparkSession, d: String): DataFrame = {
    val per = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .groupBy(col("n_orders")).agg(count(lit(1)).as("n_custs"))
      .transform(ps(col("n_orders")))
  }

  /** Min-price supplier per part (TPC-H Q2's argmin re-expressed on the
    * lineitem-derived offer catalog): the (part, supplier) offer table
    * collapses map-side to its min observed price in exact cents, the
    * per-part argmin is ONE min(struct) partial-mergeable aggregate
    * (ties → smallest suppkey; no window rank pass over the offers),
    * and the supplier dim broadcasts onto the O(parts) winner set. */
  def qMinPriceSupplier(s: SparkSession, d: String): DataFrame = {
    val offers = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("best_c"))
    val winners = offers
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("best_c"), col("l_suppkey"))).as("w"))
      .select(col("l_partkey"), col("w.l_suppkey").as("s_suppkey"),
        col("w.best_c").as("best_cents"))
    winners
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        Seq("s_suppkey"))
      .select(col("l_partkey"), col("s_suppkey"), col("s_name"), col("best_cents"))
      .orderBy("l_partkey")
  }

  /** Character-trigram profile per language: top-15 trigrams of the
    * normalized text by frequency (ties → trigram) — the below-token
    * signal language-ID and gibberish filters read. The trigram stream
    * is generated row-locally (sequence + transform, no join and no
    * token shuffle), counts combine map-side, and the ranking window
    * runs on the bounded (lang, distinct-trigram) table. */
  def qCharNgrams(s: SparkSession, d: String): DataFrame = {
    val norm = Tables.documents(s, d).select(col("lang"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("t"))
      .where(length(col("t")) >= 3)
    val tri = norm.select(col("lang"), explode(expr(
      "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
    val cnt = tri.groupBy("lang", "tri").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tri"))
    cnt.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 15)
      .orderBy("lang", "rk")
  }

  /** Inter-event arrival-gap distribution per event type: consecutive
    * same-user gaps in whole seconds (one user-keyed sort window, gap
    * attributed to the LATER event's type), collapsed to the
    * (type, DISTINCT gap) weight table, then exact p50/p90/max as
    * cumulative-rank crossings over VALUE cardinality — the
    * arrival-process summary capacity planning reads, never ranking
    * individual rows. */
  def qInterarrival(s: SparkSession, d: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wU))
      .where(col("prev_us").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(ts) - prev_us) div 1000000").as("gap_s"))
    val vw = gaps.groupBy(col("event_type"), col("gap_s"))
      .agg(count(lit(1)).as("wt"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("gap_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vw.withColumn("cum", sum(col("wt")).over(wOrd))
      .withColumn("n", sum(col("wt")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("gap_s"))).as("p50_s"),
        min(when(col("cum") * 10 >= col("n") * 9, col("gap_s"))).as("p90_s"),
        max(col("gap_s")).as("max_s"), min(col("n")).as("n_gaps"))
      .transform(ps(col("event_type")))
  }

  /** Embedding-norm outlier screen: each vector's squared L2 norm in
    * exact integer milli-unit quantization (Σ round(x·10³)² — row-local,
    * zero shuffle), coarsened to a BOUNDED grid (`div 10⁴` — the grid
    * spans max‖x‖²·dim/10⁴ cells regardless of corpus size), fenced
    * against the per-label median grid cell (rank crossing over the
    * bounded (label, cell) table, label-row broadcast back). Flags
    * > 2× / < ½× the median cell — the cheap corrupt-vector screen an
    * embedding pipeline runs before indexing; all integer, no sqrt. */
  def qNormOutliers(s: SparkSession, d: String): DataFrame = {
    val n2 = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        expr("aggregate(transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)), " +
          "0L, (acc, v) -> acc + v * v)").as("norm2_mu"))
      .withColumn("q", expr("norm2_mu div 10000"))
    val vw = n2.groupBy(col("label"), col("q")).agg(count(lit(1)).as("wt"))
    val wOrd = Window.partitionBy(col("label")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = vw.withColumn("cum", sum(col("wt")).over(wOrd))
      .withColumn("n", sum(col("wt")).over(Window.partitionBy(col("label"))))
      .groupBy(col("label"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("q"))).as("med_q"))
    n2.join(broadcast(med), Seq("label"))
      .select(col("vec_id"), col("label"), col("norm2_mu"), col("q"),
        when(col("q") > col("med_q") * 2, lit("high"))
          .when(col("q") * 2 < col("med_q"), lit("low"))
          .otherwise(lit("ok")).as("flag"))
      .orderBy("vec_id")
  }

  /** TPC-H Q22 shape: per nation, the count and balance total of "idle"
    * high-value customers — positive balance ABOVE the global
    * positive-average, who never placed an URGENT order (the fixture's
    * FK coverage is dense, so literal zero-order Q22 is empty; the
    * never-urgent predicate keeps the composed shape — scalar threshold
    * + anti-join + group — non-degenerate at every scale). The average
    * threshold never materializes as a double: the filter
    * cross-multiplies in exact cents (`c_cents · n_pos > sum_pos_cents`),
    * the 1-row stats broadcast, and the anti-join's priority filter is
    * pushed below the join. */
  def qIdleCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
      expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
    val stats = c.where(col("cents") > 0)
      .agg(sum(col("cents")).as("sum_pos"), count(lit(1)).as("n_pos"))
    c.crossJoin(broadcast(stats))
      .where(col("cents") * col("n_pos") > col("sum_pos"))
      .join(Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("bal_cents"))
      .transform(ps(col("c_nationkey")))
  }

  /** Cross-source duplicate leakage: for every source pair, how many
    * duplicated head fingerprints (md5 of the first 5 normalized tokens
    * — the prefix-dup signal, which unlike whole-document equality
    * actually fires across sources at every fixture scale) appear in
    * BOTH — the contamination matrix a training-data curator reads
    * before mixing sources. The pair expansion is per-fingerprint over
    * its DISTINCT source set (≤ |sources| rows per fp — bounded), an
    * equi-join on the fingerprint, never a corpus self-join. */
  def qCrossSourceDup(s: SparkSession, d: String): DataFrame = {
    val fs = Tables.documents(s, d)
      .select(md5(concat_ws(" ",
        slice(split(Ops.normalizeText(col("text")), " "), 1, 5))).as("fp"),
        col("source"))
      .distinct()
    fs.as("a").join(fs.as("b"), Seq("fp"))
      .where(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_fp"))
      .transform(ps(col("source_a"), col("source_b")))
  }

  /** Seasonality index: each calendar month's exact-ppm share of its
    * priority's revenue (overflow-safe two-step long division, identical
    * in the oracle) — the month-of-year profile demand planning reads.
    * Calendar²-bounded output; one map-side-combined aggregate, one
    * 12-row-per-priority window. */
  def qSeasonalityIndex(s: SparkSession, d: String): DataFrame = {
    val m = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        month(col("o_orderdate")).cast("long").as("moy"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("cents"))
    m.withColumn("tot",
        sum(col("cents")).over(Window.partitionBy(col("o_orderpriority"))))
      .select(col("o_orderpriority"), col("moy"), col("cents"),
        expr(ppmDiv("cents", "tot")).as("ppm"))
      .transform(ps(col("o_orderpriority"), col("moy")))
  }

  /** Snapshot diff (the read side of CDC): two deterministic order
    * snapshots — "old" drops every 7th key, "new" drops every 5th and
    * bumps every 3rd key's price — reconciled into added / removed /
    * changed / unchanged counts and the net cents delta. ONE full-outer
    * equi-join on the key (both sides co-partition on one exchange
    * each); the 4-row readout is what a warehouse emits as its change
    * manifest between loads. */
  def qSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val old = o.where(expr("k % 7 != 0"))
      .select(col("k"), col("cents").as("old_c"))
    val nw = o.where(expr("k % 5 != 0")).select(col("k"),
      expr("cents + CASE WHEN k % 3 = 0 THEN 1000 ELSE 0 END").as("new_c"))
    old.join(nw, Seq("k"), "full_outer")
      .select(
        when(col("old_c").isNull, lit("added"))
          .when(col("new_c").isNull, lit("removed"))
          .when(col("old_c") === col("new_c"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        (coalesce(col("new_c"), lit(0L)) - coalesce(col("old_c"), lit(0L)))
          .as("delta"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col("delta")).as("delta_cents"))
      .transform(ps(col("status")))
  }

  /** Burst-day detection: days whose event count exceeds 2× the mean of
    * the previous 7 OBSERVED days (integer cross-multiply
    * `n·7 > 2·trail`, full-window guard) per event type — the anomaly
    * screen an ops dashboard runs on arrival counts. The window frame is
    * row-bounded over the calendar-bounded daily table; nothing scans
    * raw events twice. */
  def qBurstDays(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily.withColumn("trail", sum(col("n")).over(w))
      .withColumn("trail_days", count(col("n")).over(w).cast("long"))
      .where(col("trail_days") === 7 && col("n") * 7 > col("trail") * 2)
      .select(col("event_type"), col("day"), col("n"), col("trail"))
      .orderBy("event_type", "day")
  }

  /** Max concurrent sessions per day — the classic sweep-line, made
    * distributed: 24 h-gap sessions become ±1 boundary deltas, deltas
    * collapse per INSTANT (map-side; same-instant start+end net out, a
    * stated half-open convention), and the global running concurrency is
    * the two-phase scalable prefix sum ([[graft.operators.Ops
    * .prefixSumScalable]] — bucket bases + bucket-local windows, never
    * the single-task global window). Output: per day with ≥1 boundary,
    * the max concurrency reached at a boundary instant. */
  def qMaxConcurrency(s: SparkSession, d: String): DataFrame = {
    val sess = Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "24 hours"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("session_window.start")).as("t0"),
        unix_micros(col("session_window.end")).as("t1"))
    val bounds = sess.select(col("t0").as("t"), lit(1L).as("delta"))
      .unionByName(sess.select(col("t1").as("t"), lit(-1L).as("delta")))
      .groupBy("t").agg(sum(col("delta")).as("net"))
    Ops.prefixSumScalable(bounds, "t", "net", "before")
      .select(expr("CAST(timestamp_micros(t) AS DATE)").as("day"),
        (col("before") + col("net")).as("conc"))
      .groupBy("day")
      .agg(max(col("conc")).as("max_conc"), count(lit(1)).as("n_boundaries"))
      .orderBy("day")
  }

  /** Survivorship rules over the exact-dup clusters: the canonical
    * member is the HIGHEST-QUALITY one (longest normalized text, tie →
    * smallest doc_id) instead of [[qExactDedup]]'s arbitrary min-id —
    * the curation-policy layer a production dedup applies when it must
    * keep the best copy. One fp-keyed max(struct) aggregate
    * (partial-mergeable, no rank window over members) + an fp equi-join
    * back onto the corpus. */
  def qDedupSurvivorship(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d).select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"),
      length(Ops.normalizeText(col("text"))).cast("long").as("len"))
    val win = t.groupBy("fp")
      .agg(max(struct(col("len"), (-col("doc_id")).as("nid"))).as("w"))
      .select(col("fp"), col("w.len").as("best_len"),
        (-col("w.nid")).as("canonical_id"))
    t.join(win, Seq("fp"))
      .select(col("doc_id"), col("canonical_id"), col("best_len"),
        (col("doc_id") === col("canonical_id")).as("survives"))
      .orderBy("doc_id")
  }

  /** Growth accounting: every active (user, day) classified as NEW
    * (first-ever day), RETAINED (also active the previous calendar day),
    * RESURRECTED (seen before, but not yesterday) — plus the day's
    * CHURNED count (active yesterday, absent today, attributed to
    * today) — the DAU decomposition every product dashboard leads with.
    * One distinct (user, day) collapse (map-side), one user-keyed lag
    * window, calendar-bounded output; churn is the same lag read
    * forward (a user's next-day absence), never an anti-join per day. */
  def qGrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val tagged = ud
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("next", lead(col("day"), 1).over(w))
    val states = tagged.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("new_users"),
        sum(when(expr("prev = day - INTERVAL 1 DAY"), 1L).otherwise(0L))
          .as("retained"),
        sum(when(col("prev").isNotNull
          && expr("prev < day - INTERVAL 1 DAY"), 1L).otherwise(0L))
          .as("resurrected"))
    // churned on day D+1 = active on D with no activity on D+1
    val churn = tagged
      .where(col("next").isNull || expr("next > day + INTERVAL 1 DAY"))
      .select(expr("day + INTERVAL 1 DAY").cast("date").as("day"))
      .groupBy("day").agg(count(lit(1)).as("churned"))
    states.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        coalesce(col("resurrected"), lit(0L)).as("resurrected"),
        coalesce(col("churned"), lit(0L)).as("churned"))
      .orderBy("day")
  }

  /** Quantile normalization of the event value — the rank-based feature
    * transform ML preprocessing applies when magnitudes are unreliable:
    * each event's value mapped to its exact global rank ppm
    * `(rank−1)·10⁶ div (n−1)` over the (cents, event_id) total order.
    * The rank is the two-phase scalable global row number
    * ([[graft.operators.Ops.globalRowNumberScalable]] — never the
    * single-task `row_number() OVER (ORDER BY …)`), the ppm is exact
    * integer arithmetic, and the output is row-bound (one row per
    * event). */
  def qQuantileNormalize(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"),
      expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val ranked = Ops.globalRowNumberScalable(ev, "cents", Seq("event_id"), "rk")
    val total = ev.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total))
      .select(col("event_id"), col("cents"),
        expr("CASE WHEN n_total = 1 THEN CAST(0 AS BIGINT) ELSE " +
          ppmDiv("(rk - 1)", "(n_total - 1)") + " END").as("rank_ppm"))
      .orderBy("event_id")
  }

  /** Engine-semantics pin for SIGNED integer division: every fixed-point
    * helper here (scaledDiv/roundDiv) and the k-means centroid
    * ([[graft.operators.Similarity]] kmeansStepPrecomputed) relies on
    * Spark's `div` and DuckDB's `//` BOTH truncating toward zero on
    * negative operands — previously asserted only in a code comment. This
    * bounded 25-row readout states the truncating quotient, remainder and
    * the sign-adjusted round-half-away-from-zero form over a signed value
    * grid (±137·k spans both signs and both rounding directions), so an
    * engine semantics change to floor division flips the hash and fails
    * the driver gate loudly instead of silently skewing boundary cells. */
  def qDivConvention(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        ((col("n_nationkey") - lit(12)) * lit(137)).cast("long").as("v"))
      .select(col("n_nationkey"), col("v"),
        expr("v div 100").as("q_trunc"),
        expr("v % 100").as("r_trunc"),
        expr("(v + (CASE WHEN v < 0 THEN -50 ELSE 50 END)) div 100").as("q_half"))
      .orderBy("n_nationkey")

  /** Multimodal metadata summary on the driver board: a deterministic
    * media corpus derived from `documents` (the fixture carries no binary
    * column) — modality and duration keyed off `doc_id` ONLY, with the
    * text bytes standing in as the opaque `content` column — summarized by
    * [[graft.operators.Multimodal.metadataSummary]]. Because every
    * metadata column derives from `doc_id`, columnar pruning must reduce
    * the scan to the single `doc_id` column — `content` (the dominant
    * chunk at 100 TB) is never read, which the plan pin asserts via
    * ReadSchema. Output is bounded (3 modalities × 1 format each). */
  def qMediaSummary(s: SparkSession, d: String): DataFrame = {
    val media = Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END").as("kind"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' " +
        "ELSE 'mp4' END").as("format"),
      col("text").cast("binary").as("content"),
      expr("CASE doc_id % 3 WHEN 1 THEN 1000 + (doc_id % 11) * 500 " +
        "WHEN 2 THEN 4000 + (doc_id % 7) * 1000 ELSE 0 END").as("duration_ms"))
    graft.operators.Multimodal.metadataSummary(media)
      .transform(ps(col("kind"), col("format")))
  }

  /** Forecasting-revenue-change aggregate (TPC-H Q6 shape): total
    * discounted revenue that would be recovered by dropping discounts in a
    * band — one fully-pushed scan filter (shipdate year + quantity reach
    * the parquet scan as range predicates) into one map-side-combined
    * 1-row sum. Exactness: discount is compared and summed as 4-dp fixed
    * point (`d4 = round(l_discount·10⁴)` — the fixture's discounts are
    * exact 2-dp multiples, so d4 is exact), revenue accumulates in
    * 10⁻⁶-dollar units (cents · d4): per-row ≤ ~7·10⁹, so the int64 sum
    * has headroom to ~10⁹ qualifying rows (≈ sf150) — same documented
    * bound as Q1's micro-unit sum. */
  def qForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") < 24)
      .select(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("price_c"),
        expr("CAST(round(l_discount * 10000, 0) AS BIGINT)").as("d4"))
      .where(col("d4").between(500L, 700L))
      .agg(sum(col("price_c") * col("d4")).as("revenue_u6"),
        count(lit(1)).as("n_lines"))

  /** Volume shipping between nations (TPC-H Q7 shape): bilateral
    * cross-border revenue by (supplier nation, customer nation, ship
    * year) — all nation pairs rather than Q7's two-literal filter so the
    * smallest fixture still exercises the shape (output stays bounded at
    * ≤ |nations|² × |years|). Join order is scale-honest: orders ⋈
    * customer is the one big-big shuffle (customer grows with SF — NOT
    * broadcast), lineitem then lands on the SAME `orderkey`
    * co-partitioning, and only the genuinely bounded supplier→nation
    * lookup broadcasts. Revenue in exact 10⁻⁶-dollar units
    * (cents · (10⁴ − d4)). */
  def qVolumeShipping(s: SparkSession, d: String): DataFrame = {
    val suppN = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey").as("supp_nation"))
    val custN = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").as("cust_nation"))
    val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(custN, col("o_custkey") === col("c_custkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        (expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)") *
          (lit(10000L) - expr("CAST(round(l_discount * 10000, 0) AS BIGINT)")))
          .as("rev_u6"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(col("rev_u6")).as("revenue_u6"), count(lit(1)).as("n_lines"))
      .transform(ps(col("supp_nation"), col("cust_nation"), col("l_year")))

  }

  /** Discounted revenue for targeted (brand, size, quantity) segments
    * (TPC-H Q19 shape): a 3-arm disjunctive predicate over part
    * attributes × lineitem quantity. The part dimension pre-filters to
    * the 3 brands BEFORE broadcasting (the broadcast side is 3/25 of the
    * dim); the disjunction is evaluated post-join in one codegen stage;
    * the quantity range filter (covering all arms) is pushed to the fact
    * scan. Exact micro-unit revenue; 3-row output. */
  def qBrandQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val pt = Tables.part(s, d)
      .where(col("p_brand").isin("Brand#3", "Brand#9", "Brand#15"))
      .select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(s, d)
      .where(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        (expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)") *
          (lit(10000L) - expr("CAST(round(l_discount * 10000, 0) AS BIGINT)")))
          .as("rev_u6"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("qty").between(1L, 11L)) ||
        (col("p_brand") === "Brand#9" && col("p_size").between(1, 25) &&
          col("qty").between(10L, 20L)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
          col("qty").between(20L, 30L)))
      .groupBy(col("p_brand"))
      .agg(sum(col("rev_u6")).as("revenue_u6"), count(lit(1)).as("n_lines"))
      .transform(ps(col("p_brand")))
  }

  /** Power-of-2 document-length histogram per language — the corpus
    * length profile every training-data curation pass starts from. The
    * bucket bound is integer-exact (no float log2 whose exact-power
    * boundaries round differently per engine): a 21-row bucket table
    * [2^b, 2^(b+1)) broadcasts into a binned range join, then one
    * map-side-combined (lang, bucket) count. Scales as a linear scan —
    * the range join is against a CONSTANT 21-row side. */
  def qDocLenHist(s: SparkSession, d: String): DataFrame = {
    val buckets = s.range(0, 21).select(col("id").cast("long").as("b"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").as("lo"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(id + 1 AS INT))").as("hi"))
    Tables.documents(s, d).select(col("lang"), col("n_chars"))
      .join(broadcast(buckets),
        col("n_chars") >= col("lo") && col("n_chars") < col("hi"))
      .groupBy(col("lang"), col("b"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .transform(ps(col("lang"), col("b")))
  }

  /** Language-mix matrix: per-source language distribution in exact ppm
    * — the dataset-composition report for a multilingual corpus. Two
    * map-side-combined aggregates over the SAME (source, lang) cells and
    * one broadcast of the bounded per-source totals; ppm via the
    * overflow-safe two-step integer division ([[scaledDiv]], restated
    * identically in the oracle). Output bounded at |sources|·|langs|. */
  def qLangMix(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("source")).agg(sum(col("n")).as("tot"))
    cells.join(broadcast(totals), Seq("source"))
      .withColumn("ppm", expr(scaledDiv("n", "tot", 1000L, 1000L)))
      .select(col("source"), col("lang"), col("n"), col("ppm"))
      .transform(ps(col("source"), col("lang")))
  }

  /** Deterministic round-robin source interleave — the training-order
    * layout step that stripes a mixed corpus so no source forms a run.
    * Per-source position = hash-order row number (a PARTITIONED window:
    * each source sorts its own rows, never a global single-task sort);
    * global position = (rn−1)·|sources| + source index, with the bounded
    * source-index table broadcast. Row-linear output, deterministic in
    * (doc_id, source) via the portable Knuth hash. */
  def qInterleave(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val srcIdx = docs.select("source").distinct()
      .withColumn("src_idx",
        row_number().over(Window.orderBy(col("source"))).cast("long") - 1L)
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy()))
    val w = Window.partitionBy(col("source"))
      .orderBy(Ops.seededHash(col("doc_id"), 0L), col("doc_id"))
    docs.withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(srcIdx), Seq("source"))
      .select(col("doc_id"), col("source"),
        ((col("rn") - 1L) * col("n_src") + col("src_idx")).as("pos"))
      .transform(ps(col("pos")))
  }

  /** LSH band-health statistics: the bucket-size distribution per minhash
    * band — the metric that says whether banding is splitting the corpus
    * into join-safe buckets or drifting toward quadratic blowup (the
    * thing [[graft.operators.TextOps.lshCandidatePairs]]'s maxBucket
    * guard defends against, here made observable). Signature build is the
    * linear minhash pass; each band's histogram is two map-side-combined
    * aggregates over (bucket) then (size); output is bounded by the
    * number of DISTINCT sizes per band. */
  def qBandStats(s: SparkSession, d: String): DataFrame = {
    val sig = TextOps.minhashSignatureMd5(Tables.documents(s, d), "doc_id", "text", 3, 4)
    (1 to 4).map { i =>
      sig.groupBy(col(s"mh$i").as("bucket")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_buckets"))
        .select(lit(i.toLong).as("band"), col("size"), col("n_buckets"))
    }.reduce(_ unionByName _)
      .transform(ps(col("band"), col("size")))
  }

  /** Order-priority check (TPC-H Q4 shape, adapted to the fixture's
    * columns — the reference schema's commit/receipt date pair is absent,
    * so "late" is DECLARED as a lineitem shipped more than 30 days after
    * its order date). One quarter of orders, each kept iff at least one
    * late line exists: a LEFT SEMI join on the order key with the date
    * residual evaluated inside the join — the correlated EXISTS rewritten
    * so lineitem is scanned ONCE, never re-scanned per order. The quarter
    * filter is pushed to the orders scan (pruning most of the probe before
    * the shuffle); the final aggregate is a bounded priority census. */
  def qOrderPriority(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1996-04-01").cast("date"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
        col("o_orderpriority"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"))
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("sd") > date_add(col("od"), 30), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
      .transform(ps(col("o_orderpriority")))
  }

  /** Suppliers who kept orders waiting (TPC-H Q21 shape, adapted: "late"
    * = shipped more than 60 days after the order date, on finished
    * orders). The textbook form is TWO correlated EXISTS over lineitem
    * (another supplier exists / no other supplier was late) — three scans
    * of the fact; this is the one-pass aggregate rewrite: group the
    * finished-order fact once by order key, count distinct suppliers and
    * distinct LATE suppliers, and emit a blame row only when the order
    * had ≥2 suppliers and EXACTLY one was late (the max over the
    * late-supplier set is then that supplier). One fact shuffle on the
    * order key replaces both self-joins; the supplier dim broadcasts;
    * the top-10 is TakeOrderedAndProject with a total (numwait desc,
    * suppkey) order. */
  def qLateSuppliers(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate").cast("date").as("sd"))
    val perOrder = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("sd") > date_add(col("od"), 60)).as("late"))
      .groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
        max(when(col("late"), col("l_suppkey"))).as("blame"))
    perOrder.where(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("blame").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        Seq("s_suppkey"))
      .select(col("s_name"), col("s_suppkey"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(10)
  }

  /** Bollinger-band breach screen over the daily revenue series per order
    * priority: a day breaches when its revenue leaves the ±2σ band of its
    * trailing 7 OBSERVED days (itself excluded; at least 4 required). The
    * band test is exact integer arithmetic end to end — revenue quantizes
    * to hundred-dollar units (`rev_h`, int64 headroom past sf10³) and
    * `v ≷ μ ± 2σ` cross-multiplies to `sign(n·v − S)` plus
    * `(n·v − S)² > 4·(n·Σx² − S²)` — no sqrt, no float boundary for the
    * two engines to disagree on. The series is one calendar-bounded
    * aggregate; the window is priority-partitioned with a bounded ROWS
    * frame (constant state per row at any scale); output is breach rows
    * only. */
  def qBollinger(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("rev_c"))
      .select(col("o_orderpriority"), col("day"),
        expr("rev_c div 10000").as("rev_h"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("rev_h")).over(w))
      .withColumn("s2", sum(col("rev_h") * col("rev_h")).over(w))
      .where(col("n") >= 4)
      .withColumn("dev", col("n") * col("rev_h") - col("s"))
      .withColumn("var4", lit(4L) * (col("n") * col("s2") - col("s") * col("s")))
      .where(col("dev") =!= 0L && col("dev") * col("dev") > col("var4"))
      .select(col("o_orderpriority"), col("day"), col("rev_h"),
        col("n").as("win_n"),
        when(col("dev") > 0, lit("hi")).otherwise(lit("lo")).as("band"))
      .transform(ps(col("o_orderpriority"), col("day")))
  }

  /** Retrieval-quality NDCG@10: ten probe vectors score the candidate
    * corpus by cosine, relevance = label agreement, and each probe gets
    * its normalized discounted cumulative gain — the ranking-eval metric
    * a similarity-search index is tuned against. Ranking is by the
    * ROUNDED similarity with a vec_id tie-break (the q_cosine_topk
    * determinism convention, so both engines rank identically); the
    * log2 discount and the final NDCG are continuous doubles rounded at
    * presentation (measure-zero boundary risk). The probe side is a
    * 10-row broadcast; candidates are scanned once and the per-probe
    * top-10 is a rank window under the probe key — candidate×probe rows
    * never shuffle more than once. IDCG folds over sequence(1, n_rel)
    * row-locally (guarded: n_rel = 0 → NDCG 0). */
  def qNdcg(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("simr").desc, col("vec_id"))
    emb.where(col("vec_id") >= 10)
      .crossJoin(broadcast(probes))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        round(cosine_sim(col("embedding"), col("q_emb")), 4).as("simr"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
      .withColumn("rel",
        when(col("label") === col("q_label"), 1.0).otherwise(0.0))
      .groupBy("q_id")
      .agg(sum(col("rel") / log2(col("rank").cast("double") + 1.0)).as("dcg"),
        sum(col("rel")).cast("long").as("n_rel"))
      .withColumn("idcg", when(col("n_rel") > 0,
        expr("aggregate(sequence(1L, n_rel), CAST(0 AS DOUBLE), " +
          "(acc, i) -> acc + CAST(1 AS DOUBLE) / log2(CAST(i AS DOUBLE) + 1.0))"))
        .otherwise(lit(1.0)))
      .select(col("q_id"), col("n_rel"), round(col("dcg"), 4).as("dcg"),
        when(col("n_rel") === 0, 0.0)
          .otherwise(round(col("dcg") / col("idcg"), 4)).as("ndcg"))
      .transform(ps(col("q_id")))
  }

  /** Hashing-trick collision audit: every corpus token maps to one of 64
    * feature buckets by a PORTABLE md5 hash (the engine-neutral stand-in
    * for the murmur hashing a feature-hashed model uses), and the audit
    * reports per-bucket occupancy — occurrences, distinct token types
    * (the collision count), and load share in exact ppm. The decision
    * input for sizing a hashed feature space: heavy buckets mean
    * gradient collisions. Token counts aggregate map-side twice (token,
    * then bucket); the corpus total is a 1-row broadcast; output is the
    * constant 64-row bucket table at any scale. */
  def qFeatureHash(s: SparkSession, d: String): DataFrame = {
    val perTok = Tables.documents(s, d)
      .select(explode(
        graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val bucketed = perTok
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(token), 1, 15), 16, 10) AS BIGINT) % 64"))
      .groupBy("bucket")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"))
    bucketed
      .crossJoin(broadcast(bucketed.agg(sum(col("n_tokens")).as("__t"))))
      .select(col("bucket"), col("n_tokens"), col("n_types"),
        // two-step ppm: the naive n_tokens*10^6 wraps int64 past ~9.2e12
        // tokens per bucket — real exposure at the query's own 100-TB story
        expr(ppmDiv("n_tokens", "__t")).as("load_ppm"))
      .transform(ps(col("bucket")))
  }

  /** Per-document token Shannon entropy (bits): `H = log2(n) − Σc·log2(c)/n`
    * over the doc's token counts — the lexical-diversity signal that
    * separates natural prose from degenerate repetition (a spam/boilerplate
    * screen complementing the Gopher repetition fractions, which count
    * only top-k duplication). Two map-side-combinable aggregate levels
    * ((doc, token) then doc) — no windows, no collect; entropy is a
    * continuous double rounded at presentation. */
  def qDocEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(
          graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("__clog"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(log2(col("n_tokens").cast("double")) - col("__clog") / col("n_tokens"), 4)
          .as("entropy_bits"))
      .transform(ps(col("doc_id")))

  /** Maximum-inner-product top-20 (the recommender-scoring variant of
    * [[qCosineTopk]]: rank by the raw dot product, no normalization — the
    * metric a trained two-tower model retrieves against, where vector
    * NORM carries popularity signal that cosine would erase). The probe
    * is a literal array folded into the scan projection (one driver
    * round-trip for one vector); the dot is the index-ordered zip_with/
    * aggregate fold (both engines accumulate left-to-right in double, so
    * the rounded score matches bit-for-bit); the top-20 is
    * TakeOrderedAndProject under the (dot desc, vec_id) total order —
    * no global sort at any scale. */
  def qMips(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probe = emb.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0).toArray
    val probeCol = array(probe.map(v => lit(v.toDouble)): _*)
    val dot = aggregate(
      zip_with(col("embedding").cast("array<double>"), probeCol, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    emb.where(col("vec_id") =!= 1)
      .select(col("vec_id"), round(dot, 4).as("dot"), col("label"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(20)
  }

  /** One BPE-training count step: the top-20 adjacent character-pair merge
    * candidates over the corpus token stream (the argmax of this table IS
    * the first merge a byte-pair-encoding tokenizer learns; iterating
    * count→merge is BPE training). Pair generation is row-local
    * (sequence + substring over each token occurrence — no joins, no
    * windows), counts combine map-side, and the top-20 is TakeOrdered
    * under the (count desc, pair) total order. At 100 TB this is the
    * canonical map-side-combinable heavy-hitter shape. */
  def qBpeMerges(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(
        graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
        .as("token"))
      .where(length(col("token")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(token) - 1), i -> substring(token, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(20)

  /** Local clustering coefficient over the co-purchase graph: per part,
    * `triangles · 10⁶ div C(deg, 2)` — how close the node's neighborhood
    * is to a clique (the community-structure signal behind hub/bridge
    * classification). Triangles reuse the degree-ordered orientation
    * (out-degree O(√m), skew-proof wedge join); the per-node count is one
    * bounded aggregate over the triangle set; degree ≥ 2 nodes left-join
    * the count (0-triangle nodes kept). Top-20 by the (coeff desc,
    * partkey) total order. Oracle = naive triple-join enumeration. */
  def qClusteringCoeff(s: SparkSession, d: String): DataFrame = {
    val (e, deg) = coPurchaseGraph(s, d)
    val triPerNode = coPurchaseTriangles(e)
      .select(explode(array(col("w"), col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.where(col("d") >= 2)
      .join(triPerNode, Seq("n"), "left")
      .select(col("n").as("l_partkey"), col("d").as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coeff_ppm",
        expr("(n_tri * 1000000) div ((deg * (deg - 1)) div 2)"))
      .orderBy(col("coeff_ppm").desc, col("l_partkey"))
      .limit(20)
  }

  /** Video frame-sampling schedule ([[graft.operators.Multimodal
    * .frameSchedule]]) over the synthetic media metadata (same
    * documents-derived media frame as [[qMediaSummary]]): one row per
    * frame to decode — every second, capped at 8 per asset — computed
    * from METADATA alone (the binary content column is never touched; the
    * schedule joins back to bytes only for frames actually decoded). Pure
    * row-local sequence+explode map stage; the frame hash is portable md5
    * so the schedule cross-checks in DuckDB. */
  def qFrameSample(s: SparkSession, d: String): DataFrame = {
    val media = Tables.documents(s, d)
      .where(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("media_id"), lit("video").as("kind"),
        expr("4000 + (doc_id % 7) * 1000").as("duration_ms"))
    graft.operators.Multimodal.frameSchedule(media, 1000L, 8)
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Product-line profit by supplier nation and order year (TPC-H Q9
    * shape; the fixture has no partsupp, so unit cost is DECLARED as 80 %
    * of the part's retail price). Profit accumulates in exact 10⁻⁶-dollar
    * units: `price_c·(10⁴ − d4) − qty·retail_c·8000` — per-row ≤ ~10¹¹,
    * so the int64 sum holds to ~10⁷ qualifying rows per (nation, year)
    * group (≈ sf100; shard by month beyond). Red-part filter prunes the
    * part dim BEFORE broadcast; supplier→nation is a broadcast chain; the
    * fact shuffles once for the bounded (nation, year) grid. */
  def qNationProfit(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d).where(col("p_name").contains("red"))
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)").as("retail_c"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("o_year"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("price_c"),
        expr("CAST(round(l_discount * 10000, 0) AS BIGINT)").as("d4"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("n_name"), col("o_year"),
        (col("price_c") * (lit(10000L) - col("d4")) -
          col("qty") * col("retail_c") * lit(8000L)).as("amount_u6"))
      .groupBy("n_name", "o_year")
      .agg(sum(col("amount_u6")).as("profit_u6"), count(lit(1)).as("n_lines"))
      .transform(ps(col("n_name"), col("o_year")))
  }

  /** Parts/supplier relationship census (TPC-H Q16 shape; the fixture has
    * no partsupp, so the supplier↔part relation is the DISTINCT
    * (partkey, suppkey) pairs observed in lineitem). Per (brand, type,
    * size) outside one excluded brand: how many distinct suppliers offer
    * such parts, excluding "complaint" suppliers (declared: negative
    * account balance — the fixture analog of the Q16 LIKE screen). The
    * fact collapses to the distinct pair table FIRST (one shuffle,
    * map-side combinable), the part dim broadcasts, the blacklist is a
    * broadcast anti-join, and the count-distinct runs over the bounded
    * attribute grid. Top-20 by (suppliers desc, brand, type, size). */
  def qPartSupplierCounts(s: SparkSession, d: String): DataFrame = {
    val rel = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val badSupp = Tables.supplier(s, d).where(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val part = Tables.part(s, d).where(col("p_brand") =!= "Brand#17")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    rel.join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(20)
  }

  /** Dominant-supplier screen (TPC-H Q20 shape; no partsupp availqty in
    * the fixture, so "excess share" is DECLARED as supplying more than
    * half of a part's 1996 shipped quantity). Per (part, supplier) vs
    * per-part totals — the comparison is the exact integer cross-multiply
    * `2·s_qty > tot_qty` (never a ratio double); both grains ride ONE
    * fact scan (the per-part total re-aggregates from the pair grain —
    * strictly smaller than the fact), the dominated-part count per
    * supplier is bounded by |part|, and the supplier dim broadcasts for
    * the name readout. Top-20 by (parts dominated desc, suppkey). */
  def qDominantSupplier(s: SparkSession, d: String): DataFrame = {
    // the explicit not-null guards match what the downstream equi-join
    // would infer on ONE branch only — stating them on the source keeps
    // the pair and total subtrees statically identical, so AQE stage
    // reuse serves both grains from one shuffle instead of re-scanning
    val pairs = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_partkey").isNotNull && col("l_suppkey").isNotNull)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("s_qty"))
    val totals = pairs.groupBy("l_partkey")
      .agg(sum(col("s_qty")).as("tot_qty"))
    pairs.join(totals, Seq("l_partkey"))
      .where(col("s_qty") * 2 > col("tot_qty"))
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("n_parts_dominated"),
        sum(col("s_qty")).as("qty_dominated"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        Seq("s_suppkey"))
      .select(col("s_name"), col("s_suppkey"), col("n_parts_dominated"),
        col("qty_dominated"))
      .orderBy(col("n_parts_dominated").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Blocklist curation screen: per source, how many documents contain at
    * least one blocked term, with per-term hit counts — the wordlist
    * filtering pass (NSFW/toxicity/spam lexicons) every corpus curation
    * pipeline runs before training. The blocklist is a literal array
    * folded into the scan projection (broadcast-free: the membership test
    * is `arrays_overlap` / per-term `array_contains` over the row-local
    * token array — no token-stream explode, no join); both output grains
    * aggregate map-side over the bounded (source × term) space. */
  def qBlocklistFilter(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("slow", "dup", "stream", "sort")
    val toks = Tables.documents(s, d)
      .select(col("source"),
        graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1)
          .as("toks"))
    val hits = terms.map(t =>
      sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
        .as(s"hits_$t"))
    val aggs = Seq(
      sum(when(arrays_overlap(col("toks"),
        array(terms.map(lit): _*)), 1L).otherwise(0L)).as("n_blocked")) ++ hits
    toks.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .transform(ps(col("source")))
  }

  /** 2-core decomposition run to the FIXPOINT under a declared round cap
    * ([[KcoreCap]] = 8): each round drops nodes of degree < 2 and the
    * edges touching them, and the loop stops at the first round that
    * drops nothing (edge count unchanged ⇒ degrees unchanged ⇒ keep set
    * unchanged ⇒ fixpoint — pruning is monotone). Output is the full
    * 8-row shrink trace with a per-round `converged` flag; rounds after
    * convergence repeat the fixpoint counts with the flag set, so the
    * row count is DECLARED and the DuckDB oracle restates the loop as 8
    * materialized CTE rounds (identity after the fixpoint) while the
    * Spark loop still stops early — the executed-round count is exposed
    * to the spec via [[kcoreTrace]]. Each executed round is one semi-join
    * per endpoint over the current edge set, its edge count FUSED into
    * the checkpoint materialization as a `Dataset.observe` metric (one
    * job per round, plus one bounded node-count readout); lineage
    * truncates per round via [[graft.operators.Checkpoints.truncate]]
    * (local or reliable by conf) — without it round i re-derives rounds
    * 1..i−1 once per downstream aggregate (measured 24 s → 3 s at
    * sf0.01). The trace itself is ≤8 rows of 4 longs — the one
    * driver-side structure, bounded at any scale. */
  def qKcore(s: SparkSession, d: String): DataFrame = kcoreTrace(s, d)._1

  private[graft] val KcoreCap = 8

  /** The k-core loop; returns (trace frame, rounds actually executed) so
    * the spec can pin early termination. */
  private[graft] def kcoreTrace(s: SparkSession, d: String): (DataFrame, Int) = {
    import s.implicits._
    val (e0, _) = coPurchaseGraph(s, d)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("pa").as("n")).unionAll(e.select(col("pb").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
    def prune(e: DataFrame): DataFrame = {
      val keep = degrees(e).where(col("d") >= 2).select("n")
      e.join(keep.withColumnRenamed("n", "pa"), Seq("pa"), "left_semi")
        .join(keep.withColumnRenamed("n", "pb"), Seq("pb"), "left_semi")
        .select("pa", "pb")
    }
    def observedCount(obs: org.apache.spark.sql.Observation): Long =
      obs.get.getOrElse("n", 0L) match {
        case null => 0L
        case x => x.asInstanceOf[Long]
      }
    // Empty-graph guard (one limit-1 job, pre-loop only): AQE's
    // empty-relation propagation can eliminate a CollectMetrics node on a
    // provably-empty plan, which would block Observation.get forever.
    if (e0.isEmpty) {
      val rows = (1 to KcoreCap).map(i => (i.toLong, 0L, 0L, 1L))
      return (rows.toDF("round", "n_nodes", "n_edges", "converged"), 0)
    }
    val obs0 = org.apache.spark.sql.Observation()
    var e = e0.observe(obs0, count(lit(1)).as("n"))
      .transform(Checkpoints.truncate)
    var prevEdges = observedCount(obs0)
    var trace = Vector.empty[(Long, Long, Long, Long)]
    var rounds = 0
    var converged = false
    while (!converged && rounds < KcoreCap) {
      val obs = org.apache.spark.sql.Observation()
      val next = prune(e).observe(obs, count(lit(1)).as("n"))
        .transform(Checkpoints.truncate)
      val nEdges = observedCount(obs)
      val nNodes = degrees(next).count()
      converged = nEdges == prevEdges
      rounds += 1
      trace :+= ((rounds.toLong, nNodes, nEdges, if (converged) 1L else 0L))
      prevEdges = nEdges
      e.unpersist()
      e = next
    }
    e.unpersist()
    val tail = trace.last
    val full = trace ++
      (rounds + 1 to KcoreCap).map(i => (i.toLong, tail._2, tail._3, 1L))
    (full.toDF("round", "n_nodes", "n_edges", "converged"), rounds)
  }

  /** Last-touch marketing attribution: each purchase is credited to the
    * user's most recent PRECEDING non-purchase event within 7 days
    * ('direct' when none) — the channel-credit readout of the event log.
    * The carry is one user-keyed window max of a monotone
    * (ts, event_id, type) struct over non-purchase rows (ts + unique
    * event_id make the order total, so the type field never decides a
    * comparison) — no self-join of the log against itself; the census is
    * a bounded per-channel aggregate. */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("prev",
        max(when(col("event_type") =!= "purchase",
          struct(col("ts"), col("event_id"), col("event_type")))).over(w))
      .where(col("event_type") === "purchase")
      .select(when(col("prev").isNull ||
          col("ts").cast("long") - col("prev.ts").cast("long") > 7L * 86400L,
          lit("direct")).otherwise(col("prev.event_type")).as("channel"))
      .groupBy("channel").agg(count(lit(1)).as("n_purchases"))
      .transform(ps(col("channel")))
  }

  /** Watermark-sizing profile: per event, how far BEHIND the user's
    * event-time high-water mark it arrived — the out-of-order-depth
    * histogram that tells a streaming deployment what
    * `withWatermark(...)` bound actually covers its data. The fixture's
    * event_id sequence is already time-sorted, so arrival order is
    * DECLARED as the portable md5 hash of event_id — a deterministic
    * shuffled ingestion sequence both engines reproduce (the profile
    * MECHANICS are the operator; the scramble just gives them a
    * non-degenerate stream). The high-water mark is one user-keyed
    * window max over the arrival order (never a global single-partition
    * window); lateness buckets are integer power-of-2 seconds via a
    * comparison chain (no float log2); output is the bounded bucket
    * census with in-order traffic as bucket −1. */
  def qLateArrivals(s: SparkSession, d: String): DataFrame = {
    val arrival =
      expr("CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
    val w = Window.partitionBy(col("user_id")).orderBy(arrival, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = Tables.events(s, d)
      .withColumn("hwm", max(col("ts")).over(w))
      .select((col("hwm").cast("long") - col("ts").cast("long")).as("late_s"))
      .select(when(col("late_s").isNull || col("late_s") <= 0, lit(-1L))
        .otherwise(
          when(col("late_s") <= 1, 0L).when(col("late_s") <= 2, 1L)
            .when(col("late_s") <= 4, 2L).when(col("late_s") <= 8, 3L)
            .when(col("late_s") <= 16, 4L).when(col("late_s") <= 32, 5L)
            .when(col("late_s") <= 64, 6L).when(col("late_s") <= 128, 7L)
            .when(col("late_s") <= 256, 8L).when(col("late_s") <= 512, 9L)
            .when(col("late_s") <= 1024, 10L).when(col("late_s") <= 2048, 11L)
            .when(col("late_s") <= 4096, 12L).when(col("late_s") <= 8192, 13L)
            .when(col("late_s") <= 16384, 14L).otherwise(15L)).as("bucket"))
    late.groupBy("bucket").agg(count(lit(1)).as("n_events"))
      .transform(ps(col("bucket")))
  }

  /** Product-quantization ANN (the IVF companion: PQ is how billion-scale
    * indexes compress vectors to bytes): the 64-dim space splits into two
    * 32-dim subspaces, each quantized against 8 seeded sub-centroids
    * (vec_id < 8 — the [[Similarity.seedCentroids]] convention), every
    * vector encodes as two codes via exact argmin (min over a
    * (distance, cid) struct — ties to the smallest centroid), and probe
    * distance is ASYMMETRIC (ADC): the probe's 16-entry distance table
    * joins the codes, so ranking costs one 16-row broadcast lookup per
    * vector instead of a 64-dim scan. Everything is relational — the
    * sub-centroid table derives from the embeddings scan (no driver
    * collect), assignment is a broadcast nest folded map-side (the
    * [[Similarity.kmeansAssignJoined]] plan-size discipline), and both
    * engines fold distances in index order so the rounded ranking
    * hash-matches. Top-10 by (approx distance asc, vec_id). */
  def qAnnPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    def halves(src: DataFrame, idAs: String, vecAs: String): DataFrame =
      src.select(col("vec_id").as(idAs),
        explode(array(
          struct(lit(0L).as("half"),
            expr("slice(CAST(embedding AS ARRAY<DOUBLE>), 1, 32)").as(vecAs)),
          struct(lit(1L).as("half"),
            expr("slice(CAST(embedding AS ARRAY<DOUBLE>), 33, 32)").as(vecAs))))
          .as("h"))
        .select(col(idAs), col("h.half").as("half"), col(s"h.$vecAs").as(vecAs))
    val cents = halves(emb.where(col("vec_id") < 8), "cid", "cv")
    val vecs = halves(emb, "vec_id", "sv")
    val dd = aggregate(
      zip_with(col("sv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val dist = vecs.join(broadcast(cents), Seq("half"))
      .select(col("vec_id"), col("half"), col("cid"), dd.as("dd"))
    val codes = dist
      .groupBy("vec_id", "half")
      .agg(min(struct(col("dd").as("d"), col("cid").as("cid"))).as("m"))
      .select(col("vec_id"), col("half"), col("m.cid").as("code"))
    val probeDist = dist.where(col("vec_id") === 0)
      .select(col("half").as("p_half"), col("cid").as("p_cid"),
        col("dd").as("pd"))
    codes.join(broadcast(probeDist),
        col("half") === col("p_half") && col("code") === col("p_cid"))
      .groupBy("vec_id").agg(sum(col("pd")).as("adist_raw"))
      .where(col("vec_id") =!= 0)
      .select(col("vec_id"), round(col("adist_raw"), 4).as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(10)
  }

  /** Quantized-prefilter + exact-rerank retrieval (the production ANN
    * serving shape: an int8 scan prunes, full precision reranks). Codes
    * use a GLOBAL symmetric scale (c = round(x·128), int8-representable
    * for the fixture's ±0.53 range — a declared corpus property), so the
    * prefilter score is an EXACT INTEGER dot product — bit-identical
    * across engines, no float ranking at the wide stage. Top-50 integer
    * candidates (TakeOrdered) rerank by exact double cosine, rounded at
    * presentation; final top-10 by (sim desc, vec_id). At 100 TB the
    * int8 codes are ¼ the bytes of fp32 — the scan that actually fits
    * in cache — and the exact rerank touches only 50 vectors. */
  def qQuantizedRerank(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val codes = expr(
      "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 128, 0) AS BIGINT))")
    val probeRow = emb.where(col("vec_id") === 2)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val pCodes = probeRow.map(v => math.round(v.toDouble * 128))
    val pCol = array(probeRow.map(v => lit(v.toDouble)): _*)
    val pCodeCol = array(pCodes.map(lit): _*)
    val idot = aggregate(
      zip_with(codes, pCodeCol, (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val sim = round(cosine_sim(col("embedding"), pCol), 4)
    emb.where(col("vec_id") =!= 2)
      .select(col("vec_id"), col("embedding"), idot.as("idot"))
      .orderBy(col("idot").desc, col("vec_id"))
      .limit(50)
      .select(col("vec_id"), col("idot"), sim.as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Bigram-LM surprisal per document (the perplexity-proxy curation
    * signal: high mean surprisal = text the corpus LM finds unlikely —
    * gibberish or out-of-domain; the bigram companion to the unigram
    * [[qRarityScore]]). Train and eval corpus coincide, so every eval
    * bigram has count ≥ 1 — no smoothing term to get wrong: surprisal =
    * mean(log2 c(w₁·) − log2 c(w₁w₂)) over the doc's bigram occurrences,
    * a continuous double rounded at presentation. Bigrams form row-locally
    * (native shingle expression — no token-stream shuffle); the count
    * tables are (bigram)- and (prefix)-keyed aggregates joined back on
    * the same keys — at fixture scale they broadcast, at corpus scale
    * they shuffle co-keyed with the stream (the standard LM-scoring
    * join). */
  def qBigramPpx(s: SparkSession, d: String): DataFrame = {
    val bi = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(
          graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 2))
          .as("bigram"))
      .withColumn("w1", expr("substring_index(bigram, ' ', 1)"))
    val biCnt = bi.groupBy("bigram").agg(count(lit(1)).as("c12"))
    val w1Cnt = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    bi.join(biCnt, Seq("bigram")).join(w1Cnt, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log2(col("c1").cast("double")) - log2(col("c12").cast("double")))
          .as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s") / col("n_bigrams"), 4).as("surprisal_bits"))
      .transform(ps(col("doc_id")))
  }

  /** Point-in-time (temporally correct) feature join — the feature-store
    * pattern that prevents label leakage in training data: each event
    * reads the customer's order-count feature AS OF the event time, never
    * a later value. The dimension is the SCD2 effective-dated build (one
    * customer-keyed lead window over orders; same-date rows collapse into
    * empty intervals, so exactly one interval covers any instant); the
    * join is equi on the customer key with the interval residual inside
    * it — co-keyed shuffle, never a cross join; events before the first
    * order keep feature 0 via the left join. Output is the bounded
    * (feature value → event count/value) census. */
  def qPitJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("valid_from"), col("o_orderkey"))
    val dim = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("valid_from"))
      .withColumn("n_orders",
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .drop("o_orderkey")
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("ed"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("val_c"))
    ev.join(dim,
        col("user_id") === col("o_custkey") &&
          col("ed") >= col("valid_from") &&
          (col("valid_to").isNull || col("ed") < col("valid_to")),
        "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("n_orders_at_event"),
        col("val_c"))
      .groupBy("n_orders_at_event")
      .agg(count(lit(1)).as("n_events"), sum(col("val_c")).as("value_c"))
      .transform(ps(col("n_orders_at_event")))
  }

  /** Deterministic negative sampling for contrastive training: for every
    * customer with at least one purchase, 5 parts they did NOT buy,
    * drawn from a DECLARED candidate pool (the top-50 most-ordered parts
    * — production negative samplers draw from a popularity pool so
    * negatives are plausible, not random catalog noise) in seeded-hash
    * order. The pool is a bounded TakeOrdered broadcast; the user×pool
    * nest anti-joins the purchase table CO-KEYED on (customer, part);
    * ranking is a customer-partitioned window over ≤50 rows — never a
    * full catalog scan per user. Knuth-arithmetic hash restates exactly
    * in SQL. */
  def qNegativeSample(s: SparkSession, d: String): DataFrame = {
    val bought = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val pool = bought.groupBy("p").agg(count(lit(1)).as("n_buyers"))
      .orderBy(col("n_buyers").desc, col("p"))
      .limit(50)
      .select(col("p").as("cand"))
    val users = bought.select(col("c")).distinct()
    val h = expr("((c * 131071 + cand) % 2147483648) * 2654435761 % 4294967296")
    val w = Window.partitionBy(col("c")).orderBy(h, col("cand"))
    users.crossJoin(broadcast(pool))
      .join(bought.withColumnRenamed("p", "cand"), Seq("c", "cand"), "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5)
      .select(col("c").as("c_custkey"), col("cand").as("l_partkey"), col("rank"))
      .orderBy("c_custkey", "rank")
  }

  /** KMV (k-minimum-values) distinct-count sketch, audited against the
    * exact answer: per event type, the k=64 smallest 52-bit md5 hashes of
    * the user ids estimate distinct users as `(k−1)·2⁵²/h₍ₖ₎` — the
    * classic bottom-k estimator, and unlike HLL fully portable (md5 both
    * engines) so the oracle checks it EXACTLY. The k-smallest selection
    * is the two-phase bucketed form: uniform hashes range-bucket evenly
    * on their top bits, so phase 1 ranks inside 128 balanced (type,
    * hash-range) partitions and phase 2 ranks only the ≤128·k survivors
    * per type — no single-task full sort at any scale (the global top-k
    * of a set is always inside the union of per-bucket top-k). At 100 TB
    * the sketch side touches each distinct hash once and keeps 64 values
    * per group; the exact side is the audit, not the product. */
  def qKmvDistinct(s: SparkSession, d: String): DataFrame = {
    val K = 64
    val hv = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 13), 16, 10) AS BIGINT)")
          .as("h"))
      .distinct() // KMV is defined over the distinct HASH set
    val b1 = Window.partitionBy(col("event_type"), col("hb")).orderBy(col("h"))
    val b2 = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val sk = hv
      .withColumn("hb", expr("h div 35184372088832")) // 2^45 → 128 range buckets
      .withColumn("r1", row_number().over(b1)).where(col("r1") <= K)
      .withColumn("r2", row_number().over(b2)).where(col("r2") <= K)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("kth"))
    val exact = Tables.events(s, d).select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_exact"))
    sk.join(exact, "event_type")
      // below k distinct hashes the sketch holds the whole set — exact;
      // 63·2⁵² ≈ 2.8e17 stays far inside int64
      .select(col("event_type"), col("n_exact"),
        when(col("n_sk") < K, col("n_sk"))
          .otherwise(expr(s"(${K - 1}L * 4503599627370496L) div kth"))
          .as("n_kmv"))
      .withColumn("err_ppm", expr("(abs(n_kmv - n_exact) * 1000000L) div n_exact"))
      .transform(ps(col("event_type")))
  }

  /** Count-min-sketch frequency estimation, audited against exact counts:
    * a d=4 × w=8 CMS over the corpus token stream (portable md5 row
    * hashes, so both engines build the IDENTICAL sketch), read back for
    * the 20 most frequent tokens — estimate = min over the 4 counters,
    * always ≥ exact, and the `overcount` column is the collision-induced
    * bias a CMS user budgets for. w=8 is DELIBERATELY undersized for the
    * fixture's 31-type vocabulary so the collision regime is actually
    * exercised (a wide sketch over this corpus measures nothing);
    * production sizes w to the heavy-hitter budget — every shape below
    * is w-independent. The counter table is one map-side-combined
    * aggregate over per-token counts (d·w rows at ANY corpus size — the
    * mergeable-sketch shape that turns 100 TB of tokens into a
    * broadcastable frequency oracle); the top-20 readout is a
    * TakeOrdered, and the probe↔counter join is a broadcast hash join.
    * AQE stage reuse serves the token-count exchange to both the sketch
    * build and the readout. */
  def qCmsEstimate(s: SparkSession, d: String): DataFrame = {
    val bucketOf = "CAST(conv(substr(md5(concat(CAST(j AS STRING), '|', token)), " +
      "1, 13), 16, 10) AS BIGINT) % 8"
    val tc = Tables.documents(s, d)
      .select(explode(
        graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val cnt = tc
      .select(col("c"), col("token"), explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("bucket", expr(bucketOf))
      .groupBy("j", "bucket").agg(sum(col("c")).as("counter"))
    tc.orderBy(col("c").desc, col("token")).limit(20)
      .select(col("token"), col("c"), explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("bucket", expr(bucketOf))
      .join(broadcast(cnt), Seq("j", "bucket"))
      .groupBy("token", "c")
      .agg(min(col("counter")).as("cms_est"))
      .select(col("token"), col("c").as("n_exact"), col("cms_est"),
        (col("cms_est") - col("c")).as("overcount"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** KMV sketch ALGEBRA — the property that makes bottom-k sketches a
    * 100-TB tool: two sketches built INDEPENDENTLY (per day, per
    * partition, per source) combine into union / intersection / Jaccard
    * estimates WITHOUT rescanning either input. Sides here are the
    * distinct customer sets ordering in 1996 (A) and 1997 (B) — overlap
    * ≈ 2/3 at every fixture, so the estimators are genuinely active.
    * Each side's K=64 bottom-k selection is the two-phase range-bucketed
    * rank (the [[qKmvDistinct]] scale guard: phase-1 windows are
    * (side, range-bucket)-bounded — never a single-task sort over the
    * distinct-hash set); everything after runs on the ≤2K sketch ROWS:
    * the union sketch is the bottom-K of the merged hash sets (a ≤128-row
    * frame — its single-partition rank is input-bounded by construction),
    * |A∪B|-hat comes from its k-th value, Jaccard-hat = shared/|usk|
    * where `shared_k` counts union-sketch hashes present in BOTH side
    * sketches, and |A∩B|-hat = Jaccard-hat · |A∪B|-hat in exact integer
    * arithmetic. Exact counterparts audited alongside with ppm errors;
    * below K distinct hashes every estimate degrades to exact. All
    * combining joins are over ≤K-row broadcasts. */
  def qKmvSetOps(s: SparkSession, d: String): DataFrame = {
    val K = 64
    val base = Tables.orders(s, d)
      .where(expr("year(o_orderdate) IN (1996, 1997)"))
      .select(expr("CAST(year(o_orderdate) AS BIGINT)").as("side"),
        col("o_custkey"))
    val hv = base
      .select(col("side"),
        expr("CAST(conv(substr(md5(CAST(o_custkey AS STRING)), 1, 13), 16, 10) AS BIGINT)")
          .as("h"))
      .distinct()
    val b1 = Window.partitionBy(col("side"), col("hb")).orderBy(col("h"))
    val b2 = Window.partitionBy(col("side")).orderBy(col("h"))
    val sk = hv
      .withColumn("hb", expr("h div 35184372088832")) // 2^45 → 128 range buckets
      .withColumn("r1", row_number().over(b1)).where(col("r1") <= K)
      .withColumn("r2", row_number().over(b2)).where(col("r2") <= K)
      .select("side", "h")
    val uw = Window.partitionBy(lit(1)).orderBy(col("h")) // ≤2K rows by construction
    val usk = sk.select("h").distinct()
      .withColumn("r", row_number().over(uw)).where(col("r") <= K)
      .select("h")
    val stats = usk.agg(count(lit(1)).as("n_usk"), max(col("h")).as("kth"))
    val shared = usk
      .join(sk.where(col("side") === 1996).select("h"), Seq("h"), "left_semi")
      .join(sk.where(col("side") === 1997).select("h"), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("shared_k"))
    val du = base.distinct()
    val unionExact = du.agg(countDistinct(col("o_custkey")).as("n_union_exact"))
    val interExact = du.groupBy("o_custkey").agg(count(lit(1)).as("ns"))
      .where(col("ns") === 2).agg(count(lit(1)).as("n_inter_exact"))
    stats.crossJoin(broadcast(shared))
      .crossJoin(broadcast(unionExact)).crossJoin(broadcast(interExact))
      .withColumn("n_union_kmv",
        when(col("n_usk") < K, col("n_usk"))
          .otherwise(expr(s"(${K - 1}L * 4503599627370496L) div kth")))
      .withColumn("n_inter_kmv", expr("(shared_k * n_union_kmv) div n_usk"))
      .select(col("n_union_exact"), col("n_union_kmv"),
        expr("(abs(n_union_kmv - n_union_exact) * 1000000L) div n_union_exact")
          .as("union_err_ppm"),
        col("n_inter_exact"), col("n_inter_kmv"),
        expr("(abs(n_inter_kmv - n_inter_exact) * 1000000L) div n_inter_exact")
          .as("inter_err_ppm"),
        col("shared_k"), col("n_usk"))
  }

  /** Mergeable histogram quantiles — the QUANTILE member of the sketch
    * family ([[qKmvDistinct]] distinct, [[qCmsEstimate]] frequency,
    * q_heavy_hitters top-k): a B=64 equi-width counter histogram over
    * price cents is the mergeable shape (per-partition histograms ADD —
    * at 100 TB each executor emits 64 longs and the quantile never sees
    * the data again), read back by interpolating the target rank inside
    * its bucket, audited against the EXACT order statistic. Deliberately
    * coarse (64 buckets over the full price domain) so the interpolation
    * error is real and the `err_ppm` audit measures something. Every step
    * is exact integer arithmetic on cents (domain split and bucket edges
    * by the same `(i·(mx−mn+1)) div B` formula in both engines, so edges
    * are byte-identical); the exact side extracts ranks
    * `(p·(n−1)) div 100` via the two-phase scalable global row number —
    * never a single-task sort of the data. The only single-partition
    * window is the cumulative sum over the 64-row histogram itself —
    * bounded by construction at any scale. Domain stats and the 3-row
    * target table ride 1-row/bounded broadcasts. */
  def qHistQuantiles(s: SparkSession, d: String): DataFrame = {
    val B = 64
    val cents = Tables.lineitem(s, d)
      .select(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"))
    val stats = cents.agg(count(lit(1)).as("n"), min("c").as("mn"), max("c").as("mx"))
    val hist = cents.crossJoin(broadcast(stats))
      .withColumn("b",
        expr(s"CASE WHEN mx = mn THEN 0L ELSE ((c - mn) * $B) div (mx - mn + 1) END"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1) // ≤64 rows by construction
    val cum = hist.withColumn("cum", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
    val targets = stats
      .select(explode(array(lit(50L), lit(90L), lit(99L))).as("p"),
        col("n"), col("mn"), col("mx"))
      .withColumn("r", expr("(p * (n - 1)) div 100"))
    val est = targets.join(broadcast(cum),
        col("r") >= col("cum") && col("r") < col("cum") + col("cnt"))
      .withColumn("lo",
        expr(s"CASE WHEN mx = mn THEN mn ELSE mn + (b * (mx - mn + 1)) div $B END"))
      .withColumn("hi",
        expr(s"CASE WHEN mx = mn THEN mx + 1 ELSE mn + ((b + 1) * (mx - mn + 1)) div $B END"))
      .withColumn("est_cents", expr("lo + ((r - cum) * (hi - lo)) div cnt"))
      .select("p", "n", "r", "est_cents")
    val ranked = Ops.globalRowNumberScalable(cents, "c", Seq("c"), "rk")
    val exact = broadcast(targets.select(col("p").as("__p"), (col("r") + 1).as("__t")))
      .join(ranked, col("rk") === col("__t"))
      .select(col("__p").as("p"), col("c").as("exact_cents"))
    est.join(exact, "p")
      .select(col("p"), col("n"), col("est_cents"), col("exact_cents"),
        expr("(abs(est_cents - exact_cents) * 1000000L) div exact_cents")
          .as("err_ppm"))
      .transform(ps(col("p")))
  }

  /** Join-cardinality estimation from Fast-AGMS (count) sketches — the CBO
    * input that prices a many-to-many join WITHOUT running it (the
    * [[qNdvStats]] companion: NDV prices distinct-ness, this prices the
    * blowup). Sides are 1996 vs 1997 shipments keyed by `l_partkey`; the
    * true join size `Σₖ aₖ·bₖ` never materializes the join — it folds over
    * the per-key count table. Each side compresses into a d=9 × w=64
    * COUNT-SKETCH (bucket AND ±1 sign from portable md5, so both engines
    * build the IDENTICAL sketch), and the estimate is the Fast-AGMS inner
    * product: per depth `Σ_w cA[j][w]·cB[j][w]`, read out at the MEDIAN —
    * d odd so the median is ONE order statistic over the 9-row estimate
    * frame. Unlike the CMS inner product (whose collision mass overcounts
    * quadratically in key density — measured 250× over at sf0.01), the
    * signed estimator is UNBIASED with variance ∝ F₂(A)·F₂(B)/w: measured
    * 1–10 % across fixtures, and EXACT whenever ≤ w keys land
    * collision-free (signs cancel only across distinct keys). Shapes at
    * 100 TB: ONE fact scan feeds the per-key count aggregate (map-side
    * combined; AQE stage reuse serves it to the exact fold and the sketch
    * build), counter tables are d·w = 576 rows per side at ANY scale, the
    * estimate joins 576-row frames, and the median ranks 9 rows. Bucket
    * sums are signed row counts — int64-safe to ~9.2·10¹⁸ row-pairs per
    * bucket product (the [[qNationProfit]]-style declared ceiling). */
  def qJoinSizeEst(s: SparkSession, d: String): DataFrame = {
    val bucketOf = "CAST(conv(substr(md5(concat(CAST(j AS STRING), '|', " +
      "CAST(k AS STRING))), 1, 13), 16, 10) AS BIGINT) % 64"
    val signOf = "CASE WHEN CAST(conv(substr(md5(concat('s', CAST(j AS STRING), '|', " +
      "CAST(k AS STRING))), 1, 13), 16, 10) AS BIGINT) % 2 = 0 THEN 1L ELSE -1L END"
    val kc = Tables.lineitem(s, d)
      .where(expr("year(l_shipdate) IN (1996, 1997)"))
      .groupBy(col("l_partkey").as("k"))
      .agg(sum(expr("CAST(year(l_shipdate) = 1996 AS BIGINT)")).as("a"),
        sum(expr("CAST(year(l_shipdate) = 1997 AS BIGINT)")).as("b"))
    val exact = kc.agg(sum(col("a") * col("b")).as("n_exact"))
    val wm = Window.orderBy(col("ip"), col("j")) // 9 rows by construction
    val est = kc
      .select(col("k"), col("a"), col("b"), explode(expr("sequence(0, 8)")).as("j"))
      .withColumn("bucket", expr(bucketOf))
      .withColumn("sgn", expr(signOf))
      .groupBy("j", "bucket")
      .agg(sum(col("a") * col("sgn")).as("ca"), sum(col("b") * col("sgn")).as("cb"))
      .groupBy("j").agg(sum(col("ca") * col("cb")).as("ip"))
      .withColumn("r", row_number().over(wm)).where(col("r") === 5)
      .select(col("ip").as("est_agms"))
    est.crossJoin(broadcast(exact))
      .select(col("n_exact"), col("est_agms"),
        expr("(abs(est_agms - n_exact) * 1000000L) div n_exact").as("err_ppm"))
  }

  /** AMS second-moment (self-join size) estimation, audited against exact
    * F₂ — the OTHER half of the sketch-driven CBO: F₂ = Σᵤ cᵤ² on the
    * event log's user key prices self-joins and skew (a heavy key
    * dominates F₂ long before it dominates the row count). The Fast-AGMS
    * form of the tug-of-war sketch: d=9 rows × w=64 signed-count buckets
    * (bucket and ±1 sign both portable md5, so the sketch is IDENTICAL in
    * both engines), per-row estimate `Σ_w S[j][w]²`, read out at the
    * median — d odd so the median is ONE order statistic, a rank over the
    * 9-row estimate frame (bounded by construction at any scale).
    * Unbiased, variance ∝ 2·F₂²/w (measured ≤ 6 % at every fixture), and
    * EXACT whenever ≤ w keys land collision-free. Per-key counts combine
    * map-side and AQE stage reuse serves them to both the exact fold and
    * the sketch; the sketch shuffle is d·w = 576 longs per executor
    * regardless of input. Bucket sums are signed row counts — int64-safe
    * while F₂ < 9.2·10¹⁸ (same declared ceiling as the exact side it
    * audits). */
  def qAmsF2(s: SparkSession, d: String): DataFrame = {
    val bucketOf = "CAST(conv(substr(md5(concat(CAST(j AS STRING), '|', " +
      "CAST(user_id AS STRING))), 1, 13), 16, 10) AS BIGINT) % 64"
    val signOf = "CASE WHEN CAST(conv(substr(md5(concat('s', CAST(j AS STRING), '|', " +
      "CAST(user_id AS STRING))), 1, 13), 16, 10) AS BIGINT) % 2 = 0 " +
      "THEN 1L ELSE -1L END"
    val uc = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
    val exact = uc.agg(sum(col("c") * col("c")).as("f2_exact"))
    val wm = Window.orderBy(col("estj"), col("j")) // 9 rows by construction
    val med = uc
      .select(col("user_id"), col("c"), explode(expr("sequence(0, 8)")).as("j"))
      .withColumn("bucket", expr(bucketOf))
      .withColumn("sgn", expr(signOf))
      .groupBy("j", "bucket").agg(sum(col("c") * col("sgn")).as("sb"))
      .groupBy("j").agg(sum(col("sb") * col("sb")).as("estj"))
      .withColumn("r", row_number().over(wm)).where(col("r") === 5)
      .select(col("estj").as("f2_ams"))
    med.crossJoin(broadcast(exact))
      .select(col("f2_exact"), col("f2_ams"),
        expr("(abs(f2_ams - f2_exact) * 1000000L) div f2_exact").as("err_ppm"))
  }

  /** Mean-reciprocal-rank eval at k=10 over the [[qNdcg]] probe protocol
    * (same 10 broadcast probes, same rounded-sim + vec_id total order,
    * same label-match relevance) — the first-hit metric a retrieval stack
    * reports next to NDCG: per probe, the rank of the FIRST relevant
    * result inside the top-10 (0 = miss) and its reciprocal in exact ppm
    * (`10⁶ div rank` — integer, no float division to disagree on). The
    * per-probe ranking partitions on q_id exactly as q_ndcg does (10
    * bounded probe partitions; the candidate set is the parallel unit);
    * misses survive via the probe-side left join, so the output is always
    * the full 10-row probe table. */
  def qMrr(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("simr").desc, col("vec_id"))
    val hits = emb.where(col("vec_id") >= 10)
      .crossJoin(broadcast(probes))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        round(cosine_sim(col("embedding"), col("q_emb")), 4).as("simr"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10 && col("label") === col("q_label"))
      .groupBy("q_id").agg(min(col("rank")).cast("long").as("frr"))
    probes.select("q_id")
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("frr"), lit(0L)).as("first_rel_rank"),
        when(col("frr").isNull, lit(0L))
          .otherwise(expr("1000000L div frr")).as("rr_ppm"))
      .transform(ps(col("q_id")))
  }

  /** Reciprocal-rank fusion of two retrieval rankers — the standard hybrid
    * combine (`score = Σ 1/(60+rank)`, Cormack et al.) restated in exact
    * integer parts-per-billion (`10⁹ div (60+rank)`) so both engines agree
    * bit-for-bit. The two rankers are the repo's own dense pair: cosine
    * ([[qCosineTopk]]'s metric) and raw inner product ([[qMips]]'s) against
    * the vec_id=1 probe — they genuinely disagree wherever vector norm
    * carries signal. Fusion is over each ranker's top-20 LIST (absent ⇒
    * contributes 0 — the production form: lists are what the servers
    * return), so the only windows rank 20-row frames (bounded by
    * construction; the top-20s themselves are TakeOrdered, no global
    * sort), the combine is a 20∪20-row full-outer join, and the probe is
    * the one bounded driver round-trip the MIPS family already budgets. */
  def qRankFusion(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probe = emb.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0).toArray
    val probeCol = array(probe.map(v => lit(v.toDouble)): _*)
    val dot = aggregate(
      zip_with(col("embedding").cast("array<double>"), probeCol, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val scored = emb.where(col("vec_id") =!= 1)
      .select(col("vec_id"),
        round(cosine_sim(col("embedding"), probeCol), 4).as("simr"),
        round(dot, 4).as("dotr"))
    val topCos = scored.orderBy(col("simr").desc, col("vec_id")).limit(20)
      .withColumn("rank_cos", // 20 rows by construction
        row_number().over(Window.orderBy(col("simr").desc, col("vec_id"))))
      .select("vec_id", "rank_cos")
    val topDot = scored.orderBy(col("dotr").desc, col("vec_id")).limit(20)
      .withColumn("rank_dot", // 20 rows by construction
        row_number().over(Window.orderBy(col("dotr").desc, col("vec_id"))))
      .select("vec_id", "rank_dot")
    topCos.join(topDot, Seq("vec_id"), "full_outer")
      .select(col("vec_id"),
        coalesce(col("rank_cos"), lit(0)).cast("long").as("rank_cos"),
        coalesce(col("rank_dot"), lit(0)).cast("long").as("rank_dot"))
      .withColumn("rrf_ppb",
        expr("CASE WHEN rank_cos = 0 THEN 0L ELSE 1000000000L div (60 + rank_cos) END + " +
          "CASE WHEN rank_dot = 0 THEN 0L ELSE 1000000000L div (60 + rank_dot) END"))
      .orderBy(col("rrf_ppb").desc, col("vec_id"))
      .limit(10)
  }

  /** DSIR-style importance weighting (Data Selection via Importance
    * Resampling, Xie et al. 2023, in its deterministic hashed-feature
    * form) — the curation operator that SCORES raw data by how
    * target-like it is instead of filtering by hand-written rules. Both
    * distributions live in a 256-bucket hashed unigram feature space
    * (portable md5, the [[qFeatureHash]] trick): `target` = the declared
    * high-quality source (`src0`), `raw` = the rest; each gets
    * add-one-smoothed bucket probabilities, and a document's weight is its
    * token-wise log-likelihood ratio `Σ log₂ p_t(b(tok)) − log₂ p_r(b(tok))`
    * (rounded at presentation — continuous, measure-zero boundary). `keep`
    * flags logw > 0: resampling by these weights shifts raw data toward
    * the target distribution. Shapes at 100 TB: token → bucket is
    * row-local, both distribution tables are 256-row map-side aggregates
    * broadcast into the scoring join, the per-doc sum is one map-side-
    * combinable aggregate — linear end-to-end, no windows, no pairs. */
  def qDsirWeights(s: SparkSession, d: String): DataFrame = {
    val B = 256
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(
          graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .withColumn("b",
        expr(s"CAST(conv(substr(md5(token), 1, 15), 16, 10) AS BIGINT) % $B"))
    val dist = toks
      .groupBy("b")
      .agg(sum(expr("CAST(source = 'src0' AS BIGINT)")).as("ct"),
        sum(expr("CAST(source <> 'src0' AS BIGINT)")).as("cr"))
    val tot = dist.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val ratio = dist.crossJoin(broadcast(tot))
      .select(col("b"),
        // add-one smoothing keeps empty buckets finite on both sides
        (log2((col("ct") + 1).cast("double")) - log2((col("nt") + B).cast("double"))
          - log2((col("cr") + 1).cast("double")) + log2((col("nr") + B).cast("double")))
          .as("llr"))
    toks.join(broadcast(ratio), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("llr")).as("lw"))
      .select(col("doc_id"), col("n_tokens"), round(col("lw"), 4).as("logw"),
        expr("CAST(lw > 0 AS BIGINT)").as("keep"))
      .transform(ps(col("doc_id")))
  }

  /** χ²-based discriminative-token selection — the feature-selection step
    * behind fastText-style domain/language classifiers (the model CCNet
    * and DSIR pipelines train to score raw crawl): for each token, a 2×2
    * contingency of occurrence counts in the declared target class
    * (`lang = 'en'`) vs the rest, scored `χ² = n·(ad−bc)²/((a+b)(c+d)(a+c)(b+d))`
    * and read back as the top-20 under the (rounded χ², token) total
    * order. Counts are exact integers; the statistic is evaluated in
    * double from exact int64 counts (identical expression both engines,
    * counts ≪ 2⁵³) and rounded at presentation. A min-support screen
    * (a+b ≥ 5) drops degenerate rare-token spikes. Shapes at 100 TB: one
    * token-grain map-side count aggregate, a 1-row total broadcast, a
    * row-local statistic, TakeOrdered top-20 — no windows, no pairs. */
  def qChi2Tokens(s: SparkSession, d: String): DataFrame = {
    // ONE tokenize pass: totals fold from the per-token count table (the
    // pre-filter aggregate), never from a second scan of the corpus
    val counts = Tables.documents(s, d)
      .select(col("lang"),
        explode(
          graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .groupBy("token")
      .agg(sum(expr("CAST(lang = 'en' AS BIGINT)")).as("a"),
        sum(expr("CAST(lang <> 'en' AS BIGINT)")).as("b"))
    val tc = counts.where(col("a") + col("b") >= 5)
    val tot = counts.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    tc.crossJoin(broadcast(tot))
      .select(col("token"), col("a"), col("b"),
        (col("ta") - col("a")).as("c"), (col("tb") - col("b")).as("d"))
      // every operand to double BEFORE multiplying: a·d etc. would overflow
      // int64 at web-corpus counts; in double the statistic stays continuous
      // and both engines execute the identical IEEE expression
      .withColumn("chi2", round(
        expr("CAST(a + b + c + d AS DOUBLE) * " +
          "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) * " +
          "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))" +
          " / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))"), 4))
      .select("token", "a", "b", "chi2")
      .orderBy(col("chi2").desc, col("token"))
      .limit(20)
  }

  /** Per-group mergeable histogram quantiles — [[qHistQuantiles]] lifted
    * to the GROUPED form a warehouse actually serves (per-nation price
    * p50/p95): every nation gets its own B=32 equi-width cent histogram
    * (per-nation domain from a bounded 25-row stats broadcast; edges by
    * the same `(i·(mx−mn+1)) div B` integer formula both engines), counters
    * merge map-side, and rank interpolation reads each target inside its
    * containing bucket. The exact audit uses the SKETCH to bound its own
    * cost: the histogram names each target's containing bucket, so the
    * order statistic ranks only that (nation, bucket, target) slice —
    * every window frame is ~1/B of its nation's rows (a naive
    * nation-keyed rank would put a whole nation in ONE task at 100 TB);
    * equal cent values make the extracted value invariant to tie order.
    * Output is the fixed |nations| × 2-target grid, all integer cents. */
  def qGroupQuantiles(s: SparkSession, d: String): DataFrame = {
    val B = 32
    val bucketExpr =
      s"CASE WHEN mx = mn THEN 0L ELSE ((c - mn) * $B) div (mx - mn + 1) END"
    val cents = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nation"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"))
    val stats = cents.groupBy("nation")
      .agg(count(lit(1)).as("n"), min("c").as("mn"), max("c").as("mx"))
    val withB = cents.join(broadcast(stats), "nation").withColumn("b", expr(bucketExpr))
    val hist = withB.groupBy("nation", "b").agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(col("nation")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1) // ≤32 rows per nation
    val cum = hist.withColumn("cum", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
    val targets = stats
      .select(col("nation"), explode(array(lit(50L), lit(95L))).as("p"),
        col("n"), col("mn"), col("mx"))
      .withColumn("r", expr("(p * (n - 1)) div 100"))
    val est = targets.join(broadcast(cum), Seq("nation"))
      .where(col("r") >= col("cum") && col("r") < col("cum") + col("cnt"))
      .withColumn("lo",
        expr(s"CASE WHEN mx = mn THEN mn ELSE mn + (b * (mx - mn + 1)) div $B END"))
      .withColumn("hi",
        expr(s"CASE WHEN mx = mn THEN mx + 1 ELSE mn + ((b + 1) * (mx - mn + 1)) div $B END"))
      .withColumn("est_cents", expr("lo + ((r - cum) * (hi - lo)) div cnt"))
      .select("nation", "p", "n", "r", "est_cents", "b", "cum")
    // rank-in-bucket = r - cum; only the two target buckets per nation rank
    val probe = est.select(col("nation"), col("p").as("__p"), col("b"),
      (col("r") - col("cum") + 1).as("__t"))
    val wrb = Window.partitionBy(col("nation"), col("b"), col("__p")).orderBy(col("c"))
    val exact = withB.select("nation", "b", "c")
      .join(broadcast(probe), Seq("nation", "b"))
      .withColumn("rk", row_number().over(wrb)).where(col("rk") === col("__t"))
      .select(col("nation").as("n2"), col("__p").as("p2"), col("c").as("exact_cents"))
    est.join(exact, col("nation") === col("n2") && col("p") === col("p2"))
      .select(col("nation"), col("p"), col("n"), col("est_cents"), col("exact_cents"),
        expr("(abs(est_cents - exact_cents) * 1000000L) div exact_cents")
          .as("err_ppm"))
      .transform(ps(col("nation"), col("p")))
  }

  /** Temperature-scaled dataset-mixture weights — the sampling-rate
    * computation behind multilingual/multi-source LLM training mixes
    * (mT5-style α-sampling): raw source shares p_s are flattened to
    * p_s^α so low-resource sources are up-sampled without letting any
    * source dominate. α = 0.5 exactly, so the weight is a SQUARE ROOT —
    * `w_s = floor(sqrt(n_s · 10⁶))` (fixed-point isqrt: sqrt is
    * correctly-rounded IEEE in both engines and the floor lands both on
    * the identical long, no libm-pow portability hazard). Output per
    * source: the exact char mass, raw share and temperature share in
    * exact ppm (two-step overflow-safe division), and the up/down-
    * sampling boost `temp_ppm·10⁶ div raw_ppm` — the factor a sampler
    * repeats that source relative to proportional sampling. One map-side
    * count aggregate over the corpus, a 1-row total broadcast, |sources|
    * output rows at any scale. */
  def qTemperatureMix(s: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(s, d).groupBy("source")
      .agg(sum(col("n_chars")).as("n_chars"))
      .withColumn("w", expr("CAST(floor(sqrt(CAST(n_chars AS DOUBLE) * 1000000.0)) AS BIGINT)"))
    val tot = src.agg(sum(col("n_chars")).as("tn"), sum(col("w")).as("tw"))
    src.crossJoin(broadcast(tot))
      .select(col("source"), col("n_chars"),
        expr(ppmDiv("n_chars", "tn")).as("raw_ppm"),
        expr(ppmDiv("w", "tw")).as("temp_ppm"))
      .withColumn("boost_ppm", expr("(temp_ppm * 1000000L) div raw_ppm"))
      .transform(ps(col("source")))
  }

  /** Differential-privacy-style noisy release of the per-type event
    * census — the third leg of the governance tier ([[qPiiRedact]]
    * pseudonymizes, [[qKAnonymity]] audits class sizes, this BOUNDS one
    * user's influence and perturbs the release): each user's
    * contribution to a type is CLIPPED at C = 5 events (per-user
    * sensitivity, the Δf of user-level DP), and Laplace(C/ε) noise at
    * ε = 1 is added to the clipped count. The noise is SEEDED — uniform
    * u ∈ (0,1) and a sign bit both derive from portable md5 of the
    * release key, inverse-CDF `-scale·ln(u)` — so both engines draw the
    * IDENTICAL perturbation (the determinism contract; a production
    * release would swap the seed for a secret drawn once per release,
    * changing nothing in the plan). ln is evaluated in double and the
    * released value rounds to an integer count (noise itself shown at 4
    * decimals) — the continuous-expression rounding doctrine. Shapes:
    * one (type, user)-grain map-side count aggregate, one |types|-grain
    * rollup, row-local noise arithmetic — bounded output, no windows. */
  def qDpCounts(s: SparkSession, d: String): DataFrame = {
    val clipped = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(sum(col("c")).as("n_events"),
        sum(least(col("c"), lit(5L))).as("n_clipped"))
    clipped
      .withColumn("u", expr(
        "(CAST(conv(substr(md5(concat('dp', event_type)), 1, 13), 16, 10) AS BIGINT) " +
          "% 1000000 + 1) / 1000001.0"))
      .withColumn("sgn", expr(
        "CASE WHEN CAST(conv(substr(md5(concat('dps', event_type)), 1, 13), 16, 10) AS BIGINT) " +
          "% 2 = 0 THEN 1.0 ELSE -1.0 END"))
      .withColumn("noise", expr("round(sgn * -5.0 * ln(u), 4)"))
      .select(col("event_type"), col("n_events"), col("n_clipped"),
        (col("n_events") - col("n_clipped")).as("clip_loss"),
        col("noise"),
        expr("n_clipped + CAST(round(noise, 0) AS BIGINT)").as("n_dp"))
      .transform(ps(col("event_type")))
  }

  /** ColBERT-style late-interaction retrieval (MaxSim) — the multi-vector
    * scoring model between single-vector ANN and full cross-encoders:
    * documents and the query each carry a BAG of token vectors (here the
    * embedding table regrouped 8 vectors per doc, `doc = vec_id div 8`),
    * and the score is `Σ_{q ∈ query} max_{t ∈ doc} ⟨q, t⟩` — every query
    * token finds its best-matching document token. Dot products are the
    * index-ordered zip_with/aggregate fold (bit-identical to DuckDB's
    * list_inner_product), snapped to e4 fixed-point integers BEFORE any
    * aggregation so the max and the 8-term sum are exact integer ops in
    * both engines. Shapes at 100 TB: the 8-row query bag BROADCASTS into
    * the token scan (one pass, no shuffle for the per-pair dots), the
    * (doc, query-token) max and the doc-grain sum combine map-side, and
    * the top-10 readout is TakeOrdered under the (score, doc) total
    * order — never a global sort. */
  def qMaxsim(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.embeddings(s, d)
      .select(expr("vec_id div 8").as("doc"), col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    val qtoks = toks.where(col("doc") === 0)
      .select(col("vec_id").as("q_tok"), col("emb").as("q_emb"))
    val dot = aggregate(
      zip_with(col("emb"), col("q_emb"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    toks.where(col("doc") >= 1)
      .crossJoin(broadcast(qtoks))
      .withColumn("dot_d", dot)
      .select(col("doc"), col("q_tok"),
        expr("CAST(round(dot_d * 10000, 0) AS BIGINT)").as("di"))
      .groupBy("doc", "q_tok").agg(max(col("di")).as("mx"))
      .groupBy("doc").agg(sum(col("mx")).as("maxsim_e4"))
      .orderBy(col("maxsim_e4").desc, col("doc"))
      .limit(10)
  }

  /** l-diversity audit — the [[qKAnonymity]] companion on the SENSITIVE
    * attribute: a class of k identical quasi-identifier rows still leaks
    * if every row shares one sensitive value (homogeneity attack), so
    * each (nation, segment) class is scored by how many DISTINCT
    * sensitive values (account-balance bands, width 1000) it contains.
    * Output per class: size k, diversity l, and the l < 2 / l < 3
    * violation flags an anonymization gate enforces. Exact distinct per
    * bounded class over a two-column grid — one aggregate at
    * (class, band) grain then a class-grain count, both map-side
    * combining, |nations × segments| output rows at any scale. */
  def qLDiversity(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d)
      .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
        expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("band"))
      .groupBy("nation", "segment", "band").agg(count(lit(1)).as("nb"))
      .groupBy("nation", "segment")
      .agg(sum(col("nb")).as("k"), count(lit(1)).as("l"))
      .withColumn("violates_l2", (col("l") < 2).cast("bigint"))
      .withColumn("violates_l3", (col("l") < 3).cast("bigint"))
      .transform(ps(col("nation"), col("segment")))
  }

  /** t-closeness audit — the third leg of the anonymity triad
    * ([[qKAnonymity]] bounds class SIZE, [[qLDiversity]] counts distinct
    * sensitive values, this bounds the class's sensitive DISTRIBUTION):
    * a class whose balance-band distribution mirrors the global one leaks
    * nothing even at l = 2, while a skewed class leaks by inference. The
    * statistic is the Earth-Mover's Distance over the ORDERED bands
    * (Li/Li/Venkatasubramanian 2007): with unit ground distance between
    * adjacent bands, EMD = Σ over the first B−1 band positions of
    * |cumulative(class_share − global_share)|, normalized by B−1 — all in
    * exact ppm integers (two-step overflow-safe division), so both
    * engines compute the identical statistic with zero float drift.
    * Shapes at 100 TB: three map-side-combining censuses ((class, band),
    * class, band), a dense grid built by crossing the |classes| frame
    * with a broadcast |bands| frame (both bounded enums/grids — the grid
    * NEVER grows with the corpus), and the cumulative window runs over
    * that bounded grid only. Output |classes| rows with the t > 0.15
    * violation flag an anonymization gate enforces. */
  def qTCloseness(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("band"))
    val cb = cust.groupBy("nation", "segment", "band").agg(count(lit(1)).as("cnt"))
    val cls = cb.groupBy("nation", "segment").agg(sum(col("cnt")).as("k"))
    val gb = cust.groupBy("band").agg(count(lit(1)).as("gcnt"))
    val tot = gb.agg(sum(col("gcnt")).as("n"), count(lit(1)).as("nbands"))
    val bands = gb.crossJoin(broadcast(tot))
    val w = Window.partitionBy("nation", "segment").orderBy("band")
    cls.crossJoin(broadcast(bands))
      .join(cb, Seq("nation", "segment", "band"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("delta",
        expr(ppmDiv("cnt", "k")) - expr(ppmDiv("gcnt", "n")))
      .withColumn("cum", sum(col("delta")).over(w))
      .withColumn("rb", row_number().over(w))
      .groupBy("nation", "segment")
      .agg(max(col("k")).as("k"),
        sum(when(col("rb") < col("nbands"), abs(col("cum")))
          .otherwise(lit(0L))).as("flow"),
        max(col("nbands")).as("nb"))
      .select(col("nation"), col("segment"), col("k"),
        expr("CASE WHEN nb <= 1 THEN 0L ELSE flow div (nb - 1) END").as("t_ppm"))
      .withColumn("violates_t15", (col("t_ppm") > 150000L).cast("bigint"))
      .transform(ps(col("nation"), col("segment")))
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * kernel) — the position-aware dedup signature between whole-doc
    * hashing ([[qDocFingerprint]]) and MinHash: hash every k-gram (k = 4),
    * slide a window of w = 8 consecutive hashes, and in each FULL window
    * select the minimum hash with rightmost tie-break — the guarantee is
    * that any verbatim match of ≥ w+k−1 tokens between two documents
    * shares at least one selected fingerprint, at an expected density of
    * 2/(w+1). The per-window rightmost-min is ONE struct-ordered window
    * aggregate, `min(struct(hash, −pos))` over a w-row frame — the
    * lexicographic struct order encodes the tie-break, and both engines
    * evaluate the identical portable hash (13-hex md5 prefix as int52, so
    * the fingerprint sum is overflow-safe at any document length).
    * Shapes at 100 TB: k-grams form ROW-LOCALLY (native Shingles + one
    * posexplode, zero shuffle), the sliding window partitions by doc — a
    * frame bounded by a single document's length at any corpus size —
    * and the output is one row per document (selected-fingerprint count,
    * density in exact ppm, and the checkable fingerprint sum). */
  def qWinnowFingerprint(s: SparkSession, d: String): DataFrame = {
    val ng = Tables.documents(s, d).select(col("doc_id"),
      size(graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 4))
        .cast("long").as("n_grams"))
    val fp = winnowSelected(s, d).groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"), sum(col("selh")).as("fp_sum"))
    ng.join(fp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("fp_sum"), lit(0L)).as("fp_sum"))
      .withColumn("fp_ppm",
        expr(s"CASE WHEN n_grams = 0 THEN 0L ELSE ${ppmDiv("n_fp", "n_grams")} END"))
      .orderBy("doc_id")
  }

  /** The winnowing selection shared by [[qWinnowFingerprint]] (per-doc
    * census) and [[qWinnowMatches]] (the MOSS match step): one row per
    * selected (doc, position, hash) fingerprint under the
    * rightmost-min-of-each-full-window rule. */
  private def winnowSelected(s: SparkSession, d: String): DataFrame = {
    val wWin = 8
    val sh = Tables.documents(s, d).select(col("doc_id"),
      posexplode(graft.functions.Shingles.shingles(
        Ops.normalizeText(col("text")), 4)).as(Seq("gpos", "g")))
      .select(col("doc_id"), col("gpos").cast("long").as("gpos"),
        expr("CAST(conv(substr(md5(g), 1, 13), 16, 10) AS BIGINT)").as("h"))
    val frame = Window.partitionBy("doc_id").orderBy("gpos")
      .rowsBetween(-(wWin - 1), 0)
    sh.withColumn("mn", min(struct(col("h"), (-col("gpos")).as("np"))).over(frame))
      .where(col("gpos") >= wWin - 1)
      .select(col("doc_id"), col("mn.np").as("np"), col("mn.h").as("selh"))
      .distinct()
  }

  /** The MOSS match step over [[qWinnowFingerprint]]'s selections: two
    * documents sharing ≥ 2 distinct winnow fingerprints are reported with
    * their shared count — by the winnowing guarantee every verbatim
    * overlap of ≥ w+k−1 tokens surfaces here. The join is
    * FINGERPRINT-KEYED (the LSH-bucket shape): per-doc distinct hashes
    * meet only inside a shared hash's bucket, with a df ≤ 50 cap on
    * ubiquitous fingerprints (boilerplate n-grams) so no bucket expands
    * quadratically unbounded — the same degenerate-block guard as the
    * fuzzy-match and LSH kernels, applied BEFORE any pair exists. Output
    * is pair-grain and therefore grows with the true duplicate mass, like
    * every pair-output query (excluded from the organic 10× study on the
    * identical-payload fixture for the q_setsim_join reason). */
  def qWinnowMatches(s: SparkSession, d: String): DataFrame = {
    val sel = winnowSelected(s, d).select(col("doc_id"), col("selh")).distinct()
    val df = sel.groupBy("selh").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 50)).select("selh")
    val keep = sel.join(df, Seq("selh"))
    keep.as("a").join(keep.as("b"),
        col("a.selh") === col("b.selh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
      .orderBy("doc_a", "doc_b")
  }

  /** Per-dimension embedding census — the health check an embedding
    * pipeline runs before indexing: mean, population variance, and range
    * per vector dimension, plus the dead-dimension flag (variance below
    * 0.01 — a dimension carrying no signal wastes index bytes and skews
    * cosine norms). Values snap to e4 fixed-point at the scan so every
    * moment is EXACT integer arithmetic in both engines: mean in rounded
    * e4 (sign-adjusted truncating division — round-half-away portable to
    * any truncate-toward-zero engine), variance in e8 units via
    * `(n·Σx² − (Σx)²) div n²`. int64 ceilings: Σx² stays exact to ~2·10¹⁰
    * rows per dimension at |x| ≤ 2 (e4 units ≤ 2·10⁴, squares ≤ 4·10⁸) —
    * past that, rescale the snap; the census itself is ONE
    * posexplode + one 64-group map-side aggregate, shuffle-constant at
    * any corpus size. */
  def qEmbedDimStats(s: SparkSession, d: String): DataFrame = {
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        expr("CAST(round(x * 10000, 0) AS BIGINT)").as("xe4"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum(col("xe4")).as("s1"),
        sum(col("xe4") * col("xe4")).as("s2"),
        min(col("xe4")).as("min_e4"), max(col("xe4")).as("max_e4"))
      .select(col("dim"), col("n"),
        expr("(2 * s1 + (CASE WHEN s1 < 0 THEN -1L ELSE 1L END) * n) div (2 * n)")
          .as("mean_e4"),
        expr("(n * s2 - s1 * s1) div (n * n)").as("var_e8"),
        col("min_e4"), col("max_e4"))
      .withColumn("dead", (col("var_e8") < 1000000L).cast("bigint"))
      .transform(ps(col("dim")))
  }

  /** Cluster–label purity — the embedding-quality eval between
    * unsupervised structure and supervision: every vector is assigned to
    * its nearest seeded centroid (the [[qKmeansStep]] argmin kernel — a
    * pure map-side projection against k = 8 inlined centroids), and each
    * cluster reports its size, distinct-label count, majority label, and
    * purity (majority share in exact ppm). High purity means the
    * embedding geometry already separates the labels; a low-purity
    * cluster is where a classifier trained on these vectors will bleed.
    * Shapes: assignment is row-local, the (cluster, label) census and the
    * cluster-grain struct argmax both combine map-side, output = k rows
    * at any corpus size. */
  def qClusterPurity(s: SparkSession, d: String): DataFrame = {
    val cents = cachedSeedCentroids(s, d, 8)
    Tables.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        Similarity.kmeansAssignCol("embedding", cents).as("cluster_id"))
      .groupBy("cluster_id", "label").agg(count(lit(1)).as("nl"))
      .groupBy("cluster_id")
      .agg(sum(col("nl")).as("n"), count(lit(1)).as("n_labels"),
        max(struct(col("nl"), (-col("label")).as("nlab"))).as("m"))
      .select(col("cluster_id"), col("n"), col("n_labels"),
        (-col("m.nlab")).as("majority_label"), col("m.nl").as("majority_n"))
      .withColumn("purity_ppm", expr(ppmDiv("majority_n", "n")))
      .transform(ps(col("cluster_id")))
  }

  /** Johnson–Lindenstrauss random projection with a distortion audit —
    * the dimensionality-reduction step before a cheap ANN index: 64-dim
    * vectors project to 16 dims through a SEEDED ±1 sign matrix (signs
    * from portable md5 of (i, j), so both engines hold the identical
    * matrix — a production run swaps the seed string), and the audit
    * reports, for 50 consecutive-id vector pairs, the original vs
    * projected squared distance and their ratio — the JL lemma says the
    * normalized ratio concentrates near 1. Each projected coordinate
    * snaps to e4 fixed-point BEFORE the cross-dimension sum of squares,
    * so the projected distance is exact integer arithmetic (aggregation-
    * order-free); the original distance is row-local and snaps at e8.
    * Shapes at 100 TB: the 16-row sign table broadcasts into the pair
    * scan (per-coordinate dots are codegen'd zip_with folds), the
    * pair-grain sum combines map-side, and the audit pair set is a
    * bounded id-range self-join — never all pairs. */
  def qRandomProjection(s: SparkSession, d: String): DataFrame = {
    val signs = s.range(16).toDF("j").withColumn("sgn", expr(
      "transform(sequence(0, 63), i -> CASE WHEN CAST(conv(substr(md5(" +
        "concat('jl|', CAST(i AS STRING), '|', CAST(j AS STRING))), 1, 13), 16, 10) " +
        "AS BIGINT) % 2 = 0 THEN 1.0D ELSE -1.0D END)"))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val pairs = e.where(col("vec_id") < 100 && col("vec_id") % 2 === 0).as("a")
      .join(e.where(col("vec_id") < 100 && col("vec_id") % 2 === 1).as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        zip_with(col("a.emb"), col("b.emb"), (x, y) => x - y).as("dv"))
    val od = pairs.withColumn("od2_e8", expr(
      "CAST(round(aggregate(dv, 0.0D, (acc, x) -> acc + x * x) * 100000000, 0) AS BIGINT)"))
    val pd = od.crossJoin(broadcast(signs))
      .withColumn("pj", expr(
        "CAST(round(aggregate(zip_with(dv, sgn, (x, sg) -> x * sg), 0.0D, " +
          "(acc, x) -> acc + x) * 10000, 0) AS BIGINT)"))
      .groupBy("va", "vb", "od2_e8")
      .agg(sum(col("pj") * col("pj")).as("pd2_e8"))
    pd.withColumn("pd2n", expr("pd2_e8 div 16"))
      .select(col("va"), col("vb"), col("od2_e8"), col("pd2_e8"),
        expr(s"CASE WHEN od2_e8 = 0 THEN 0L ELSE ${ppmDiv("pd2n", "od2_e8")} END")
          .as("dist_ppm"))
      .orderBy("va")
  }

  /** Kaplan–Meier survival curve over reorder gaps — the churn/retention
    * estimator done right: every consecutive order pair contributes an
    * observed event (time = gap days), each customer's last order
    * contributes a CENSORED observation (time to the corpus horizon), and
    * S(t) = Π_{u≤t}(1 − d_u/n_u) over the event times — the estimator
    * that uses censored customers correctly instead of dropping them.
    * Determinism: each step factor `ln(1 − d/n)` is row-local double
    * work from exact int64 counts snapped to e9, the log-survival is an
    * INTEGER cumulative sum, and only the final display value takes
    * `exp` (rounded to 4 — the continuous-expression doctrine); once the
    * risk set dies out (d = n) survival pins to exactly 0 via a running
    * flag, never a −∞ log. Shapes at 100 TB: the gap derivation is a
    * per-customer window (bounded by one customer's orders), the census
    * is map-side, and every curve window runs over the DISTINCT gap-day
    * frame — calendar-bounded at any corpus size. */
  def qSurvivalCurve(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("dte"), col("o_orderkey"))
    val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").cast("date").as("dte"))
    val mx = o.agg(max(col("dte")).as("maxd"))
    val obs = o.withColumn("nxt", lead(col("dte"), 1).over(w))
      .crossJoin(broadcast(mx))
      .select(
        when(col("nxt").isNotNull, datediff(col("nxt"), col("dte")))
          .otherwise(datediff(col("maxd"), col("dte"))).cast("long").as("t"),
        col("nxt").isNotNull.cast("long").as("ev"))
    val census = obs.groupBy("t").agg(
      sum(col("ev")).as("d_ev"),
      sum(lit(1L) - col("ev")).as("c_cens"),
      count(lit(1)).as("n_at"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census
      .withColumn("n_risk", sum(col("n_at")).over(wDesc))
      .withColumn("term_e9", expr(
        "CASE WHEN d_ev = 0 THEN 0L WHEN d_ev >= n_risk THEN 0L " +
          "ELSE CAST(round(ln(1.0 - CAST(d_ev AS DOUBLE) / n_risk) " +
          "* 1000000000, 0) AS BIGINT) END"))
      .withColumn("dead", max((col("d_ev") === col("n_risk")).cast("int")).over(wAsc))
      .withColumn("cum_e9", sum(col("term_e9")).over(wAsc))
      .select(col("t"), col("n_risk"), col("d_ev"), col("c_cens"),
        when(col("dead") === 1, lit(null).cast("bigint"))
          .otherwise(col("cum_e9")).as("logs_e9"),
        when(col("dead") === 1, lit(0.0))
          .otherwise(round(exp(col("cum_e9").cast("double") / lit(1e9)), 4)).as("s_r4"))
      .orderBy("t")
  }

  /** Decision-stump split finder — the first node of a tree learner (and
    * the standard univariate feature-importance probe) as a relational
    * op: the feature (first embedding coordinate, e4-snapped) buckets
    * into 64 equal-width cells against a 1-row min/max broadcast (pure
    * integer normalization, the q_zorder_layout pattern), the class
    * censuses accumulate once over the bucket order, and every candidate
    * threshold "left = buckets ≤ b" is scored by weighted Gini impurity
    * — row-local double work from exact int64 counts snapped to e9, with
    * the argmin taken under the (gini, bucket) integer total order and
    * marked on the output curve. Windows touch only the ≤64-row bucket
    * frame; output ≤63 thresholds at any corpus size. */
  def qGiniSplit(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(
      expr("CAST(round(CAST(embedding[0] AS DOUBLE) * 10000, 0) AS BIGINT)").as("x_e4"),
      (col("label") < 5).cast("long").as("y"))
    val st = e.agg(min(col("x_e4")).as("xmin"), max(col("x_e4")).as("xmax"),
      count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val census = e.crossJoin(broadcast(st))
      .withColumn("bucket", expr(
        "CASE WHEN xmax = xmin THEN 0L ELSE least(63L, ((x_e4 - xmin) * 64) div (xmax - xmin)) END"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos_b"),
        max(col("xmin")).as("xmin"), max(col("xmax")).as("xmax"),
        max(col("n")).as("n"), max(col("pos")).as("pos"))
    val wAsc = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = census
      .withColumn("n_left", sum(col("n_b")).over(wAsc))
      .withColumn("pos_left", sum(col("pos_b")).over(wAsc))
      .where(col("n_left") < col("n"))
      .withColumn("thr_e4", expr("xmin + ((bucket + 1) * (xmax - xmin)) div 64"))
      .withColumn("wgini_e9", expr(
        "CAST(round(((n_left - (CAST(pos_left AS DOUBLE) * pos_left + " +
          "CAST(n_left - pos_left AS DOUBLE) * (n_left - pos_left)) / n_left) + " +
          "((n - n_left) - (CAST(pos - pos_left AS DOUBLE) * (pos - pos_left) + " +
          "CAST((n - n_left) - (pos - pos_left) AS DOUBLE) * ((n - n_left) - (pos - pos_left))) " +
          "/ (n - n_left))) / n * 1000000000, 0) AS BIGINT)"))
    val best = scored.agg(min(struct(col("wgini_e9"), col("bucket"))).as("b"))
      .select(col("b.bucket").as("best_bucket"))
    scored.crossJoin(broadcast(best))
      .select(col("bucket"), col("thr_e4"), col("n_left"), col("pos_left"),
        col("wgini_e9"),
        (col("bucket") === col("best_bucket")).cast("bigint").as("is_best"))
      .transform(ps(col("bucket")))
  }

  /** Population Stability Index — the model-monitoring drift scorecard
    * (the third drift lens next to [[qKsDrift]]'s max-gap and
    * [[qTvdDrift]]'s L1): the event value distribution of the first 7
    * days (reference window) against everything after, over 10
    * equal-width bins from a 1-row min/max broadcast, with add-one
    * smoothing so empty bins stay finite — PSI = Σ (p−q)·ln(p/q), each
    * bin's term row-local double work from exact smoothed int64 counts
    * snapped to e9 (the snap-then-sum doctrine; the spec asserts the
    * conventional <0.1/0.25 thresholds on the total). Shapes: one binned
    * map-side census over the scan, a dense 10-row grid by left join,
    * bounded broadcasts, 10 output rows at any corpus size. */
  def qPsiDrift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("ts"), col("value"))
      .where(col("value").isNotNull)
    val st = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"),
      min(col("ts")).as("t0"))
    val census = ev.crossJoin(broadcast(st))
      .withColumn("bin", expr(
        "CASE WHEN vmax = vmin THEN 0L ELSE least(9L, " +
          "CAST(floor((value - vmin) * 10.0 / (vmax - vmin)) AS BIGINT)) END"))
      .withColumn("is_ref",
        (col("ts") < col("t0") + expr("INTERVAL 7 DAYS")).cast("long"))
      .groupBy("bin")
      .agg(sum(col("is_ref")).as("ref_n"), sum(lit(1L) - col("is_ref")).as("cur_n"))
    val grid = s.range(10).toDF("bin").join(census, Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n", "cur_n"))
    val tot = grid.agg(sum(col("ref_n")).as("rt"), sum(col("cur_n")).as("ct"))
    grid.crossJoin(broadcast(tot))
      .withColumn("ref_ppm", expr(ppmDiv("(ref_n + 1)", "(rt + 10)")))
      .withColumn("cur_ppm", expr(ppmDiv("(cur_n + 1)", "(ct + 10)")))
      .withColumn("term_e9", expr(
        "CAST(round((CAST(ref_n + 1 AS DOUBLE) / (rt + 10) - " +
          "CAST(cur_n + 1 AS DOUBLE) / (ct + 10)) * " +
          "ln((CAST(ref_n + 1 AS DOUBLE) / (rt + 10)) / " +
          "(CAST(cur_n + 1 AS DOUBLE) / (ct + 10))) * 1000000000, 0) AS BIGINT)"))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        col("ref_ppm"), col("cur_ppm"), col("term_e9"))
      .transform(ps(col("bin")))
  }

  /** Maximal-Marginal-Relevance re-ranking — the diversification step a
    * RAG retriever runs between ANN and the context window: from the
    * cosine top-20 candidate pool, greedily select 5 documents
    * maximizing `λ·relevance − (1−λ)·max-similarity-to-already-selected`
    * (λ = 0.7, in exact integer tenths: `score = 7·rel_e4 − 3·div_e4`),
    * so near-duplicate hits don't crowd the context. The corpus-sized
    * work is ONE scan — the top-20 pool is TakeOrdered under the
    * (sim, id) total order — followed by ONE bounded 20-row driver
    * round-trip (the [[probeAndCentroids]] class: the greedy argmax over
    * a ≤20-element pool is a constant-size problem, and expressing its 5
    * dependent steps relationally was measured to re-derive the corpus
    * scan per step, 20 s vs 2 s at sf0.01). Similarities snap to e4
    * before every comparison (ties to the smaller id), and the DuckDB
    * oracle replays the identical 5 steps as chained materialized
    * CTEs — the hash match proves the driver-side greedy bit-equal to
    * the relational formulation. */
  def qMmrRerank(s: SparkSession, d: String): DataFrame = {
    val pool = mmrPool(s, d).collect().map { r =>
      (r.getLong(0), Similarity.toDoubleVec(r, 1), r.getLong(2))
    }
    def cosE4(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000)
    }
    var selected = Vector.empty[(Long, Array[Double])]
    val rows = (1 to 5).map { i =>
      val rem = pool.filterNot(c => selected.exists(_._1 == c._1))
      val best = rem.map { case (v, e, r) =>
        val div = if (selected.isEmpty) 0L
          else selected.map(x => cosE4(e, x._2)).max
        (v, e, r, div, r * 7 - div * 3)
      }.minBy { case (v, _, _, _, sc) => (-sc, v) }
      selected = selected :+ ((best._1, best._2))
      (i.toLong, best._1, best._3, best._4, best._5)
    }
    import s.implicits._
    rows.toDF("step", "vec", "rel_e4", "div_e4", "score")
  }

  /** The corpus-sized stage of [[qMmrRerank]]: the cosine top-20
    * candidate pool as one TakeOrdered pass (plan pinned in PlanSpec). */
  private[graft] def mmrPool(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probe = emb.where(col("vec_id") === 0).select(col("embedding").as("p_emb"))
    emb.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("s", cosine_sim(col("embedding"), col("p_emb")))
      .select(col("vec_id").as("vec"), col("embedding").as("emb"),
        expr("CAST(round(s * 10000, 0) AS BIGINT)").as("rel_e4"))
      .orderBy(col("rel_e4").desc, col("vec")).limit(20)
  }

  /** Top-k leaderboard churn — the stability audit behind any "top
    * products/terms/creators" surface: per month the top-10 parts by
    * revenue (exact cents, grouped top-k under the (revenue, part)
    * total order), then each consecutive month pair scored by overlap
    * count and Jaccard of the two top sets — a high-churn leaderboard
    * means rankings are noise, a frozen one means it never surfaces
    * anything new. Shapes: one (month, part) map-side census, the
    * ranking window partitioned per month (the `q_window_topk` grouped
    * shape), and the month-pair join runs over the bounded
    * 10-per-month top frame — calendar-bounded output. */
  def qTopkChurn(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(expr("CAST(date_trunc('month', o_orderdate) AS DATE)").as("month"),
        col("l_partkey").as("part"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy("month", "part").agg(sum(col("cents")).as("rev_c"))
    val w = Window.partitionBy("month").orderBy(col("rev_c").desc, col("part"))
    val top = rev.withColumn("rk", row_number().over(w)).where(col("rk") <= 10)
      .select(col("month"), col("part"))
    // actual per-month list sizes (a sparse month may carry < 10 parts) —
    // the Jaccard union is n_a + n_b - n_common, never a hard-coded 20
    val sizes = top.groupBy("month").agg(count(lit(1)).as("n_list"))
    val months = rev.select("month").distinct()
    val consec = months
      .join(months.select(add_months(col("month"), -1).as("month")).distinct(),
        Seq("month"))
      .select(col("month"), add_months(col("month"), 1).as("next_month"))
    val common = top
      .join(top.select(add_months(col("month"), -1).as("month"),
        col("part").as("part2")), Seq("month"))
      .where(col("part") === col("part2"))
      .groupBy("month").agg(count(lit(1)).as("n_common"))
    consec
      .join(sizes.withColumnRenamed("n_list", "n_a"), Seq("month"))
      .join(sizes.select(col("month").as("next_month"),
        col("n_list").as("n_b")), Seq("next_month"))
      .join(common, Seq("month"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("jaccard_ppm",
        expr(ppmDiv("n_common", "(n_a + n_b - n_common)")))
      .select(col("month"), col("next_month"), col("n_common"), col("jaccard_ppm"))
      .transform(ps(col("month")))
  }

  /** Poisson-bootstrap confidence interval — the resampling method that
    * actually works at 100 TB (Chamandy et al.'s large-scale bootstrap):
    * a classical resample needs global coordination, but drawing each
    * row's multiplicity in resample b as an independent Poisson(1) —
    * here via inverse-CDF thresholds on a SEEDED uniform from portable
    * md5, so both engines draw the identical resamples — makes
    * every replicate a map-side weighted sum. B = 64 replicates expand
    * row-locally, combining map-side before any shuffle — the exchange
    * carries 64 rows per partition, not 64× the data; values snap to e4
    * so replicate sums are exact integers, each replicate mean is a
    * round-half-up integer division, and the 95 % percentile interval
    * reads ranks 2 and 63 of the 64-row replicate frame. The uniforms
    * use the MinHash kernel's one-digest-many-families trick: 8 md5
    * digests per row (materialized in a projection BELOW the slice
    * explode, so each is computed once), each feeding 8 independent
    * 16-bit slices — 8× fewer digests than a per-(row, b) hash, measured
    * 7.6 s → ~1 s at sf0.1. ONE output row at any corpus size. */
  def qBootstrapCi(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).where(col("value").isNotNull)
      .select(col("event_id"),
        expr("CAST(round(value * 10000, 0) AS BIGINT)").as("ve4"))
    val reps = ev
      .select(col("event_id"), col("ve4"), explode(expr("sequence(0, 7)")).as("g"))
      .withColumn("dig",
        expr("md5(concat(CAST(event_id AS STRING), '#', CAST(g AS STRING)))"))
      .select(col("ve4"), col("g"), col("dig"), explode(expr("sequence(0, 7)")).as("sl"))
      .withColumn("b", col("g") * 8 + col("sl"))
      // 0.5D/65536.0D: double literals — a bare 0.5 parses as DECIMAL in
      // Spark SQL, dragging u into decimal arithmetic (slow) and the CDF
      // thresholds into truncated decimal literals
      .withColumn("u", expr(
        "(CAST(conv(substr(dig, sl * 4 + 1, 4), 16, 10) AS BIGINT) + 0.5D) / 65536.0D"))
      .withColumn("k", expr(
        "CASE WHEN u < 0.36787944117144233 THEN 0L WHEN u < 0.7357588823428847 THEN 1L " +
          "WHEN u < 0.9196986029286058 THEN 2L WHEN u < 0.9810118431238462 THEN 3L " +
          "WHEN u < 0.9963401531726563 THEN 4L WHEN u < 0.9994058151824183 THEN 5L " +
          "ELSE 6L END"))
      .groupBy("b")
      .agg(sum(col("k")).as("n_b"), sum(col("ve4") * col("k")).as("s_b"))
      .withColumn("mean_b", expr(
        s"CASE WHEN n_b = 0 THEN 0L ELSE ${roundDiv("s_b", "n_b", 1L)} END"))
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("mean_b"), col("b"))))
    val ci = ranked.agg(
      max(when(col("rn") === 2, col("mean_b"))).as("ci_lo_e4"),
      max(when(col("rn") === 63, col("mean_b"))).as("ci_hi_e4"))
    val tot = ev.agg(count(lit(1)).as("n"), sum(col("ve4")).as("sv"))
      .select(col("n"), expr(roundDiv("sv", "n", 1L)).as("mean_e4"))
    tot.crossJoin(broadcast(ci))
  }

  /** Additive seasonal decomposition (STL-lite) of the daily revenue
    * series — `y = trend + seasonal + residual`, every component EXACT
    * integer cents: the trend is a centered 7-observed-day moving
    * average (round-half-up integer division; null at the 3-row series
    * edges, the standard convention), the seasonal component is the
    * per-ISO-weekday mean of the detrended series (sign-adjusted
    * round-half-away division — detrended values go negative), and the
    * residual closes the identity exactly where the trend exists. Every
    * window runs over the DISTINCT-day frame — calendar-bounded at any
    * corpus size — and the day census itself combines map-side over the
    * scan. */
  def qSeasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(col("o_orderdate").cast("date").as("dte"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy("dte").agg(sum(col("cents")).as("y_c"))
    val wMa = Window.orderBy(col("dte")).rowsBetween(-3, 3)
    val wCnt = Window.orderBy(col("dte"))
    val trended = daily
      .withColumn("ma_n", count(lit(1)).over(wMa))
      .withColumn("ma_s", sum(col("y_c")).over(wMa))
      .withColumn("trend_c",
        when(col("ma_n") === 7, expr(roundDiv("ma_s", "7", 1L))))
      .withColumn("dow", expr("CAST(weekday(dte) AS BIGINT) + 1"))
      .withColumn("detr", col("y_c") - col("trend_c"))
    val seasonal = trended.where(col("detr").isNotNull)
      .groupBy("dow").agg(sum(col("detr")).as("sd"), count(lit(1)).as("nd"))
      .select(col("dow"), expr(
        "(2 * sd + (CASE WHEN sd < 0 THEN -1L ELSE 1L END) * nd) div (2 * nd)")
        .as("seasonal_c"))
    trended.join(broadcast(seasonal), Seq("dow"), "left")
      .select(col("dte"), col("y_c"), col("trend_c"), col("dow"),
        col("seasonal_c"),
        (col("y_c") - col("trend_c") - col("seasonal_c")).as("resid_c"))
      .orderBy("dte")
  }

  /** Per-source KL divergence from the corpus — the domain-divergence
    * statistic behind mixture design and DSIR-style selection: a source
    * whose unigram distribution sits far from the corpus carries novel
    * signal (or noise); one near zero is redundant with the mix.
    * KL(P_s ‖ P_corpus) = Σ_t p ln(p/q) over the source's tokens — finite
    * by construction (every source token is a corpus token), nonnegative
    * by Gibbs. Determinism: each token's term is ROW-LOCAL double
    * arithmetic from exact int64 counts, snapped to e9 fixed-point
    * BEFORE the per-source sum — so the aggregate is integer and
    * aggregation-order-free in both engines (the same snap-then-sum
    * doctrine as MaxSim). Shapes at 100 TB: token-grain map-side counts,
    * one TOKEN-KEYED equi join between the (source, token) and corpus
    * frames (vocab-linear, never broadcast — a 100-TB vocabulary does
    * not fit a broadcast), bounded |sources| and 1-row total broadcasts,
    * |sources| output rows. */
  def qKlDivergence(s: SparkSession, d: String): DataFrame = {
    val tfs = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("tf"))
    val ns = tfs.groupBy("source").agg(sum(col("tf")).as("n_s"))
    val uni = tfs.groupBy("token").agg(sum(col("tf")).as("ct"))
    val tot = uni.agg(sum(col("ct")).as("t_tot"))
    tfs.join(uni, Seq("token"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("term_e9", expr(
        "CAST(round((CAST(tf AS DOUBLE) / n_s) * " +
          "ln((CAST(tf AS DOUBLE) / n_s) / (CAST(ct AS DOUBLE) / t_tot)) " +
          "* 1000000000, 0) AS BIGINT)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum(col("term_e9")).as("kl_e9"))
      .transform(ps(col("source")))
  }

  /** Mutual information between the corpus's two metadata dimensions
    * (lang × source) — the association audit behind stratification
    * decisions: MI ≈ 0 means language is independent of source (stratify
    * on either); high normalized MI means per-source language skew (a
    * mixture must stratify on both). MI, both marginal entropies, and
    * NMI = MI/min(H_lang, H_source) in exact ppm — every logarithmic
    * term is row-local double work from exact int64 counts snapped to e9
    * before summation (order-free), and the grids involved are bounded
    * enums (|langs|·|sources| cells), so every join is a broadcast of a
    * bounded frame and the output is ONE row at any corpus size. */
  def qMutualInfo(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("nls"))
    val nl = cells.groupBy("lang").agg(sum(col("nls")).as("n_l"))
    val nsrc = cells.groupBy("source").agg(sum(col("nls")).as("n_s"))
    val tot = cells.agg(sum(col("nls")).as("n"))
    val hl = nl.crossJoin(broadcast(tot)).agg(sum(expr(
      "CAST(round(-(CAST(n_l AS DOUBLE) / n) * ln(CAST(n_l AS DOUBLE) / n) " +
        "* 1000000000, 0) AS BIGINT)")).as("h_lang_e9"))
    val hs = nsrc.crossJoin(broadcast(tot)).agg(sum(expr(
      "CAST(round(-(CAST(n_s AS DOUBLE) / n) * ln(CAST(n_s AS DOUBLE) / n) " +
        "* 1000000000, 0) AS BIGINT)")).as("h_source_e9"))
    cells.join(broadcast(nl), Seq("lang"))
      .join(broadcast(nsrc), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("mi_t", expr(
        "CAST(round((CAST(nls AS DOUBLE) / n) * " +
          "ln((CAST(n AS DOUBLE) * nls) / (CAST(n_l AS DOUBLE) * n_s)) " +
          "* 1000000000, 0) AS BIGINT)"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        sum(col("mi_t")).as("mi_e9"))
      .crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
      .select(col("n"), col("n_cells"), col("mi_e9"),
        col("h_lang_e9"), col("h_source_e9"),
        expr("CASE WHEN least(h_lang_e9, h_source_e9) <= 0 THEN 0L ELSE " +
          s"${ppmDiv("mi_e9", "least(h_lang_e9, h_source_e9)")} END").as("nmi_ppm"))
  }

  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions — the redundancy matrix a mixture designer reads
    * (JS ≈ 0: interchangeable sources, JS → ln 2: disjoint): for each of
    * the |sources|·(|sources|−1)/2 pairs, JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M),
    * M = ½(P+Q), split into the SHARED-token terms (computed exactly per
    * token and snapped to e9 before the pair sum) plus the closed-form
    * exclusive-mass correction `(2 − shared_P − shared_Q)·ln2 / 2` — a
    * token in only one distribution contributes exactly `p·ln2 / 2`, so
    * only the shared support ever joins. The join is TOKEN-KEYED with
    * in-bucket pair expansion bounded by |sources| per token (the
    * LSH-bucket shape, never a cross join); shares snap to e9 so every
    * aggregate is integer and order-free. Output: the bounded pair grid
    * with shared-token counts and js_e9 ∈ [0, ln2·10⁹]. */
  def qJsSources(s: SparkSession, d: String): DataFrame = {
    val tfs = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.Shingles.shingles(Ops.normalizeText(col("text")), 1))
          .as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("tf"))
    val ns = tfs.groupBy("source").agg(sum(col("tf")).as("n_s"))
    val p = tfs.join(broadcast(ns), Seq("source"))
      .select(col("source"), col("token"),
        (col("tf").cast("double") / col("n_s")).as("p"),
        expr("CAST(round((CAST(tf AS DOUBLE) / n_s) * 1000000000, 0) AS BIGINT)")
          .as("p_e9"))
    p.as("a").join(p.as("b"),
        col("a.token") === col("b.token") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.p").as("pa"), col("b.p").as("pb"),
        col("a.p_e9").as("pae9"), col("b.p_e9").as("pbe9"))
      .withColumn("term_e9", expr(
        "CAST(round(0.5 * (pa * ln(2.0 * pa / (pa + pb)) + " +
          "pb * ln(2.0 * pb / (pa + pb))) * 1000000000, 0) AS BIGINT)"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_tokens"),
        sum(col("term_e9")).as("inner_e9"),
        sum(col("pae9")).as("sp_a"), sum(col("pbe9")).as("sp_b"))
      .select(col("src_a"), col("src_b"), col("shared_tokens"),
        (col("inner_e9") + expr(
          "CAST(round((2000000000.0 - sp_a - sp_b) * 0.5 * ln(2.0), 0) AS BIGINT)"))
          .as("js_e9"))
      .transform(ps(col("src_a"), col("src_b")))
  }

  /** Contrastive triplet mining — the data-prep step behind embedding-
    * model fine-tuning (sentence-transformers style): for each anchor
    * vector, the POSITIVE is its most-similar same-label neighbour and
    * the HARD NEGATIVE its most-similar different-label neighbour — the
    * negative that currently fools the model and therefore carries the
    * gradient; `margin = pos_sim − neg_sim` is the quantity a triplet
    * loss pushes apart. Similarities snap to e4 fixed-point BEFORE the
    * argmax so both engines pick under the identical integer total order
    * (ties to the smaller candidate id), and each argmax is a
    * conditional `max(struct(sim, −id))` — a map-side-combining
    * aggregate, NO window anywhere. Shapes at 100 TB: the 8-row anchor
    * frame broadcasts into the candidate scan (one pass, the per-pair
    * cosines are codegen'd in the scan stage), and the anchor-grain
    * aggregate emits 8 rows at any corpus size. */
  def qTripletMine(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val anchors = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("anchor"), col("label").cast("long").as("a_label"),
        col("embedding").as("a_emb"))
    val cands = emb.where(col("vec_id") >= 8)
      .select(col("vec_id").as("cand"), col("label").cast("long").as("c_label"),
        col("embedding").as("c_emb"))
    cands.crossJoin(broadcast(anchors))
      .withColumn("s", cosine_sim(col("c_emb"), col("a_emb")))
      .withColumn("sim_e4", expr("CAST(round(s * 10000, 0) AS BIGINT)"))
      .groupBy("anchor", "a_label")
      .agg(
        max(when(col("c_label") === col("a_label"),
          struct(col("sim_e4"), (-col("cand")).as("nid")))).as("p"),
        max(when(col("c_label") =!= col("a_label"),
          struct(col("sim_e4"), (-col("cand")).as("nid")))).as("n"))
      .select(col("anchor"), col("a_label").as("label"),
        (-col("p.nid")).as("pos_id"), col("p.sim_e4").as("pos_sim_e4"),
        (-col("n.nid")).as("neg_id"), col("n.sim_e4").as("neg_sim_e4"),
        (col("p.sim_e4") - col("n.sim_e4")).as("margin_e4"))
      .transform(ps(col("anchor")))
  }

  /** Preference-pair construction — the RLHF/DPO data-prep step: within
    * each prompt group (here (source, lang)), the CHOSEN response is the
    * highest-scoring document and the REJECTED the lowest, kept only
    * when the scorer actually separates them (margin ≥ 1 ppm — equal-
    * score groups yield no training signal and are dropped). The score
    * is an exact-integer quality composite from the one-pass native
    * TextStats sweep: stopword density minus punctuation density, both
    * in overflow-safe ppm, with degenerate (empty) docs pinned to a
    * sentinel floor. Each group readout is one `max(struct)` /
    * `min(struct)` pair under the (score, id) total order (ties: chosen
    * takes the SMALLER id via the negated-id field, rejected the smaller
    * id directly) — map-side-combining aggregates, no window, |groups|
    * output rows at any corpus size. */
  def qPreferencePairs(s: SparkSession, d: String): DataFrame = {
    val st = graft.functions.TextStats.textStats(
      Ops.normalizeText(col("text")), STOPWORDS)
    val scored = Tables.documents(s, d).select(
      col("source"), col("lang"), col("doc_id"),
      st.getField("n_tokens").cast("long").as("nt"),
      st.getField("n_chars").cast("long").as("nc"),
      st.getField("stop_hits").cast("long").as("sh"),
      st.getField("punct_chars").cast("long").as("pc"))
      .withColumn("score", expr(
        s"CASE WHEN nt = 0 OR nc = 0 THEN -1000000L " +
          s"ELSE (${ppmDiv("sh", "nt")}) - (${ppmDiv("pc", "nc")}) END"))
    scored.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("score"), (-col("doc_id")).as("nid"))).as("best"),
        min(struct(col("score"), col("doc_id").as("id"))).as("worst"))
      .select(col("source"), col("lang"), col("n_docs"),
        (-col("best.nid")).as("chosen_id"), col("best.score").as("chosen_score"),
        col("worst.id").as("rejected_id"), col("worst.score").as("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .where(col("margin") >= 1)
      .transform(ps(col("source"), col("lang")))
  }

  /** PII pseudonymization — the governance layer every shared training
    * corpus needs before it leaves the trust boundary: the direct
    * identifier (`c_name`) is masked for display (all but the last 4
    * digits starred, width-agnostic so regenerated wider keys still
    * mask), and the JOIN key is replaced by a salted deterministic token
    * (`md5('graft-pii-v1|' ∥ key)` prefix) — the tokenization pattern
    * that preserves join algebra without raw identifiers ever crossing
    * the join. The event side tokenizes `user_id` under the SAME salt, so
    * the per-customer event rollup joins ON THE TOKEN: one co-keyed
    * shuffle, the raw key never appears in the join or the output. At
    * 100 TB both sides are map-side hash projections; the token join
    * shuffles exactly like the raw-key join it replaces (md5 output is
    * uniform, so no new skew), and the salt rotates by bumping the
    * literal. Mirrors the reference's user-facing export step
    * (spotify_etl_v2.py writes raw ids to the warehouse — this is the
    * op it would need first in a PII regime). */
  def qPiiRedact(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"),
        expr("concat('Customer#', repeat('*', length(c_name) - 13), " +
          "substring(c_name, length(c_name) - 3, 4))").as("masked_name"),
        expr("substring(md5(concat('graft-pii-v1|', CAST(c_custkey AS STRING))), 1, 16)")
          .as("pseudo"))
    val ev = Tables.events(s, d)
      .select(expr(
        "substring(md5(concat('graft-pii-v1|', CAST(user_id AS STRING))), 1, 16)")
        .as("pseudo"))
      .groupBy("pseudo").agg(count(lit(1)).as("n_events"))
    cust.join(ev, Seq("pseudo"), "left")
      .select(col("c_custkey"), col("masked_name"), col("pseudo"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("c_custkey")
  }

  /** k-anonymity audit over a declared quasi-identifier tuple
    * (nation, market segment, overdrawn flag) — the re-identification
    * risk check run before releasing "anonymized" data: every row in an
    * equivalence class of size k is indistinguishable from k−1 others,
    * so small classes are the leak surface. Output is the class-size
    * census (k → classes, rows) with the k<5 violation flag — the
    * bounded table a governance gate reads to decide suppress /
    * generalize. Two map-side-combinable aggregates (rows → classes →
    * census), no windows, no joins: at 100 TB this is one shuffle at the
    * QI grain and a second at the (bounded) class-size grain. */
  def qKAnonymity(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal") < 0).cast("int").as("overdrawn"))
      .agg(count(lit(1)).as("k"))
    classes.groupBy("k")
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
      .withColumn("violates_k5", (col("k") < lit(5)).cast("bigint"))
      .transform(ps(col("k")))
  }

  /** Z-order (Morton) layout audit — the multi-dimensional data-layout
    * op behind `OPTIMIZE ZORDER BY`: interleaving the bits of two
    * range-normalized keys makes ONE sort order give BOTH dimensions
    * locality, so per-file zone maps prune range predicates on either
    * column. Each row's (partkey, suppkey) is normalized to 8 bits
    * against the corpus min/max (a 1-row broadcast aggregate — how a
    * real optimizer job ranges its domain; never a collect), bit-
    * interleaved into a 16-bit Morton code by pure div/mod arithmetic
    * (portable to ANSI SQL verbatim), and bucketed by the top 8
    * interleaved bits — ≤256 buckets at ANY scale, each a 16×16 cell of
    * the normalized grid. The output is the bucket zone-map (min/max of
    * both raw keys) plus scan flags for two declared range predicates,
    * one per dimension — the pruning-effectiveness readout: under a
    * linear single-key layout the secondary dimension's flag would be 1
    * for every bucket; under Z-order both columns prune. Row-local map
    * work plus one bounded-grain aggregate — nothing here grows with the
    * corpus except the scan itself. */
  def qZorderLayout(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("sk"))
    val stats = li.agg(min("p").as("pmin"), max("p").as("pmax"),
      min("sk").as("smin"), max("sk").as("smax"))
    val norm = li.crossJoin(broadcast(stats))
      .withColumn("pz", expr(
        "CASE WHEN pmax = pmin THEN 0L ELSE ((p - pmin) * 255) div (pmax - pmin) END"))
      .withColumn("sz", expr(
        "CASE WHEN smax = smin THEN 0L ELSE ((sk - smin) * 255) div (smax - smin) END"))
    norm.withColumn("bucket", expr(s"(${zInterleave("div")}) div 256"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("p").as("min_p"), max("p").as("max_p"),
        min("sk").as("min_s"), max("sk").as("max_s"),
        min("pz").as("min_pz"), max("pz").as("max_pz"),
        min("sz").as("min_sz"), max("sz").as("max_sz"))
      .select(col("bucket"), col("n_rows"),
        col("min_p"), col("max_p"), col("min_s"), col("max_s"),
        (!(col("max_pz") < 96 || col("min_pz") > 127)).cast("bigint").as("scan_p"),
        (!(col("max_sz") < 64 || col("min_sz") > 95)).cast("bigint").as("scan_s"))
      .transform(ps(col("bucket")))
  }

  /** The 16-bit Morton interleave of the 8-bit normalized keys `pz`/`sz`
    * as pure integer arithmetic — `dv` is the engine's integer-division
    * token ("div" Spark, "//" DuckDB) so BOTH engines evaluate the
    * byte-identical expression. */
  private def zInterleave(dv: String): String =
    (0 until 8).map(i =>
      s"((pz $dv ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((sz $dv ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
      .mkString(" + ")

  /** Small-file compaction planner — the table-maintenance op a 100 TB
    * lakehouse runs continuously: given the file listing (modeled as one
    * segment per ship date, bytes = rows × a declared 128-byte row
    * estimate), pack date-ordered segments into target-sized rewrite
    * bins (64 KiB here; 128 MiB in production) by cumulative fill:
    * bin = exclusive-prefix-bytes div target. Contiguity in the sort key
    * is what makes the rewrite also a CLUSTERING pass, which is why the
    * packing is by running total, not best-fit. The prefix sum is the
    * scalable two-phase form ([[Ops.prefixSumScalable]]: bucket bases +
    * bucket-local windows — never a single-task global window), because
    * a real lakehouse file listing is millions of rows of METADATA: the
    * planner never touches data, only the per-segment stats, and its
    * output is O(total bytes / target) plan rows. */
  def qCompactionPlan(s: SparkSession, d: String): DataFrame = {
    val files = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("fdate"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bytes", col("n_rows") * lit(128L))
      .withColumn("dkey",
        datediff(col("fdate"), lit("1992-01-01").cast("date")).cast("long"))
    Ops.prefixSumScalable(files, "dkey", "bytes", "prefix_excl")
      .withColumn("bin_id", expr("prefix_excl div 65536 + 1"))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
        sum("bytes").as("bytes"),
        min("fdate").as("from_date"), max("fdate").as("to_date"))
      .orderBy("bin_id")
  }

  // ------------------------------------------- round-11 wave: sketches,
  // tokenizer prep, LM scoring, novelty, calibration, spectral step

  /** Portable HyperLogLog distinct-count — the third cardinality sketch
    * beside KMV ([[qKmvDistinct]]) and the Spark-private
    * `approx_count_distinct`: m = 64 registers, bucket = top 6 bits of
    * the proven-portable 60-bit md5 hash, register = max over the bucket
    * of ρ(remaining 54 bits) (position of the highest set bit from the
    * top: ρ = 55 − length(bin(rem)), an INTEGER both engines compute
    * identically — no float log2 near power-of-two boundaries). The
    * estimate keeps the harmonic sum EXACT: Σ 2^(55−ρ_j) is an int64
    * (≤ 64·2^55), with Flajolet's α₆₄·m²·2^55/S and the small-range
    * linear-counting branch (est ≤ 5m/2 with empty registers →
    * m·ln(m/V)) both taking their single final double op on that exact
    * integer state. Shapes at 100 TB: one map-side-combinable max per
    * (group, bucket) — 64 counters per group at ANY corpus size, the
    * mergeable-sketch shape — then a 64-row-per-group readout; the
    * exact audit side is the same distinct the KMV audit pays. */
  def qHllDistinct(s: SparkSession, d: String): DataFrame = {
    val m = 64
    val regs = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
      .distinct()
      .withColumn("bucket", expr("h div 18014398509481984")) // 2^54: top 6 bits
      .withColumn("rem", expr("h % 18014398509481984"))
      .withColumn("rho", expr("CASE WHEN rem = 0 THEN 55L ELSE 55L - length(bin(rem)) END"))
      .groupBy("event_type", "bucket").agg(max(col("rho")).as("reg"))
    val sk = regs.groupBy("event_type")
      .agg(count(lit(1)).as("n_full"),
        sum(expr("shiftleft(1L, CAST(55 - reg AS INT))")).as("s_full"))
      // empty registers contribute 2^55 each (ρ = 0) — add them without a grid
      .withColumn("s_inv", expr(s"s_full + (${m}L - n_full) * 36028797018963968L"))
      .withColumn("zeros", expr(s"${m}L - n_full"))
    val est = sk.withColumn("est_raw", expr(
        // Flajolet's α₆₄ = 0.709; one double expression over exact ints
        s"0.709D * ${m}D * ${m}D * 36028797018963968.0D / CAST(s_inv AS DOUBLE)"))
      .withColumn("n_hll", expr(
        s"CAST(round(CASE WHEN est_raw <= 2.5D * ${m}D AND zeros > 0 " +
          s"THEN ${m}D * ln(${m}D / CAST(zeros AS DOUBLE)) ELSE est_raw END, 0) AS BIGINT)"))
    val exact = Tables.events(s, d).select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_hll"),
        expr("(abs(n_hll - n_exact) * 1000000L) div n_exact").as("err_ppm"))
      .transform(ps(col("event_type")))
  }

  /** Bigram language-model scoring with ADD-ONE SMOOTHING — the
    * perplexity filter a pretraining curation pass runs when eval text
    * may contain bigrams the reference corpus lacks ([[qBigramPpx]] is
    * the unsmoothed train==eval surprisal; smoothing + true perplexity
    * display are what this adds): context counts derive from the bigram census
    * itself (Σ_w2 c(w1,w2), so final-token edge effects cancel by
    * construction), P(w2|w1) = (c+1)/(ctx+V), and each occurrence's
    * −ln P term is row-local double work from exact int64 counts SNAPPED
    * to e9 before the per-doc sum (order-free integers over the
    * exchange); avg NLL is round-half-up integer division, perplexity
    * `exp` only on the rounded display value. Shapes at 100 TB:
    * bigrams are row-local 2-shingles, both censuses map-side-combine,
    * the scoring join is TOKEN-KEYED (vocab-linear — never a vocab
    * broadcast), V rides a 1-row broadcast. */
  def qLmPerplexity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bg = TextOps.explodedShingles(docs, "doc_id", "text", 2)
    val bgc = bg.groupBy("shingle").agg(count(lit(1)).as("c_bg"))
      .withColumn("w1", expr("substring_index(shingle, ' ', 1)"))
    val ctx = bgc.groupBy("w1").agg(sum(col("c_bg")).as("c_ctx"))
    val vocab = TextOps.explodedShingles(docs, "doc_id", "text", 1)
      .select(col("shingle")).distinct().agg(count(lit(1)).as("v"))
    val terms = bg
      .join(bgc.select("shingle", "c_bg", "w1"), "shingle")
      .join(ctx, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("nll_e9", expr(
        "CAST(round((ln(CAST(c_ctx + v AS DOUBLE)) - ln(CAST(c_bg + 1 AS DOUBLE))) " +
          "* 1000000000, 0) AS BIGINT)"))
    terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_e9")).as("nll_sum_e9"))
      .withColumn("avg_nll_e9",
        expr(roundDiv("nll_sum_e9", "n_bigrams", 1L)))
      .withColumn("ppl_r4",
        expr("round(exp(CAST(avg_nll_e9 AS DOUBLE) / 1000000000.0D), 4)"))
      .select("doc_id", "n_bigrams", "avg_nll_e9", "ppl_r4")
      .orderBy("doc_id")
  }

  /** Brier score + reliability diagram — the probabilistic-model
    * calibration audit ([[qAucPerClass]]'s companion; [[qCalibrationBins]]
    * bins by global score DECILE while this bins by predicted
    * PROBABILITY and adds the Brier decomposition — the pair of views a
    * calibration review wants): a deterministic
    * pseudo-probability (sigmoid of the first embedding coordinate,
    * e4-snapped — the continuous-rounding doctrine) against the binary
    * label, bucketed into 10 probability bins; per bin the count, mean
    * predicted probability (exact int avg of e4 units), empirical
    * positive rate (exact ppm), and the Brier contribution
    * Σ(p − y)² in EXACT e8 integers (p, y both in e4 units — no float
    * accumulation anywhere). A calibrated model's mean_p ≈ rate per bin;
    * the gap column is the calibration error a temperature-scaling pass
    * would fix. Shapes: one map-side census into ≤10 groups, dense grid
    * via a 10-row range, bounded output. */
  def qBrierCalibration(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(expr("CAST(round(1.0D / (1.0D + exp(-CAST(embedding[0] AS DOUBLE))) " +
        "* 10000, 0) AS BIGINT)").as("p_e4"),
        expr("CAST(label < 5 AS BIGINT)").as("y"))
    val census = e
      .withColumn("bin", expr("least(9L, p_e4 div 1000)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("p_e4")).as("sp"),
        sum(col("y")).as("pos"),
        sum(expr("(p_e4 - y * 10000) * (p_e4 - y * 10000)")).as("brier_e8"))
    s.range(10).toDF("bin")
      .join(census, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("n").isNull, lit(0L))
          .otherwise(expr(roundDiv("sp", "n", 1L))).as("mean_p_e4"),
        when(col("n").isNull, lit(0L))
          .otherwise(expr(ppmDiv("pos", "n"))).as("rate_ppm"),
        coalesce(col("brier_e8"), lit(0L)).as("brier_e8"))
      .withColumn("gap_e4",
        expr("abs(mean_p_e4 - (rate_ppm div 100))"))
      .transform(ps(col("bin")))
  }

  /** One power-iteration step over the embedding COVARIANCE — true PCA
    * needs the centered second moment; [[qPowerIteration]] is the
    * uncentered Gram step with display-rounded doubles, while this one
    * centers at the snapped mean and keeps every sum an exact int64:
    * w = Cov·v₀ with a seeded ±1 start vector (the [[qRandomProjection]]
    * sign family). Exactness doctrine: coordinates
    * snap to e4 at the scan; the covariance is defined ABOUT THE
    * e4-SNAPPED MEAN (round-half-up), so every centered coordinate,
    * every row's centered dot s_r = Σ_d c_rd·v₀_d, and every per-dim
    * product sum Σ_r c_rd·s_r are EXACT int64s (|c| ≤ 2·10⁴,
    * |s| ≤ 64·2·10⁴ → per-row products ≤ 2.6·10¹⁰, safe past the 100×
    * fixture); the per-n normalization is a sign-adjusted round-half-away
    * integer division and only the display value divides once as a
    * double. Shapes at 100 TB: pass 1 is a melted 64-group map-side mean
    * census; the means come back as ONE broadcast 64-element array (an
    * array_sort(collect_list(struct)) readout — 64 rows, never a
    * vec-grain shuffle), the centered dot s_r is a row-local zip fold
    * against the inlined sign family, and the matvec is a second melted
    * 64-group map-side census — two linear passes, zero vec-keyed
    * exchanges. */
  def qPcaPower(s: SparkSession, d: String): DataFrame = {
    val signsArr = "transform(sequence(0, 63), dd -> CASE WHEN CAST(conv(substr(md5(" +
      "concat('pca|', CAST(dd AS STRING))), 1, 13), 16, 10) AS BIGINT) % 2 = 0 " +
      "THEN 1L ELSE -1L END)"
    val e4 = Tables.embeddings(s, d).select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT))")
      .as("xe4"))
    val mu = e4.select(posexplode(col("xe4")).as(Seq("d", "x")))
      .groupBy("d").agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("mu_e4", expr(
        // sign-adjusted round-half-away: sx may be negative
        "(2 * sx + (CASE WHEN sx < 0 THEN -1 ELSE 1 END) * n) div (2 * n)"))
    val mu1 = mu.agg(expr(
      "transform(array_sort(collect_list(struct(d, mu_e4))), t -> t.mu_e4)").as("mu"))
    e4.crossJoin(broadcast(mu1))
      .withColumn("c", expr("zip_with(xe4, mu, (x, m) -> x - m)"))
      .withColumn("s_r", expr(s"aggregate(zip_with(c, $signsArr, " +
        "(cc, sg) -> cc * sg), 0L, (acc, v) -> acc + v)"))
      .select(col("s_r"), posexplode(col("c")).as(Seq("d", "c_d")))
      .groupBy("d")
      .agg(sum(col("c_d") * col("s_r")).as("w_num"), count(lit(1)).as("n"))
      .withColumn("w_e8", expr(
        "(2 * w_num + (CASE WHEN w_num < 0 THEN -1 ELSE 1 END) * n) div (2 * n)"))
      .withColumn("w_r4", expr("round(CAST(w_e8 AS DOUBLE) / 100000000.0D, 4)"))
      .select(col("d").cast("long").as("d"), col("w_num"), col("w_e8"), col("w_r4"))
      .transform(ps(col("d")))
  }

  /** Watermark-fit audit — the streaming-observability query that SIZES a
    * watermark before you deploy one: with the monotone ingest id
    * (event_id) as the arrival-order proxy, an event's lateness is how far
    * its event time lags the maximum event time already seen FOR ITS KEY
    * (the per-key high-watermark — exactly what `withWatermark` tracks),
    * bucketed into the operational delays (on-time / ≤1m / ≤5m / ≤15m /
    * ≤1h / worse) with cumulative coverage ppm — read the row where
    * coverage crosses your SLA and that bucket IS your watermark. Shapes
    * at 100 TB: the running max is a USER-KEYED window (bounded by one
    * key's history, never a global sort), the census map-side-combines
    * into ≤6 groups, and the cumulative window runs over the 6-row grid. */
  def qWatermarkFit(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val census = ev.withColumn("prev_max", max(col("ts_us")).over(w))
      .withColumn("late_us",
        greatest(lit(0L), coalesce(col("prev_max") - col("ts_us"), lit(0L))))
      .withColumn("bucket", expr(
        "CASE WHEN late_us = 0 THEN 0L WHEN late_us <= 60000000L THEN 1L " +
          "WHEN late_us <= 300000000L THEN 2L WHEN late_us <= 900000000L THEN 3L " +
          "WHEN late_us <= 3600000000L THEN 4L ELSE 5L END"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val tot = census.agg(sum(col("n")).as("t"))
    val cw = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    s.range(6).toDF("bucket")
      .join(census, Seq("bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("cum_n", sum(col("n")).over(cw))
      .withColumn("cum_ppm", expr(ppmDiv("cum_n", "t")))
      .select("bucket", "n", "cum_n", "cum_ppm")
      .transform(ps(col("bucket")))
  }

  /** Out-of-vocabulary rate — the PER-DOCUMENT tokenizer-coverage audit
    * ([[qVocabCoverage]] gives the corpus-level coverage curve; the
    * per-doc grain is what a curation filter drops on) between
    * [[qBpeMerges]] and a training run: vocabulary = the corpus top-1000
    * tokens under the (count, token) total order, then each doc's OOV
    * share in exact ppm. A capped vocab is WHAT a tokenizer ships, so the corpus
    * must be scored against the cap, not the full type inventory. Shapes
    * at 100 TB: one map-side token census, a TakeOrdered top-1000 (never
    * a global sort), the vocab riding a broadcast into the second pass,
    * and a per-doc map-side aggregate — O(docs) output. */
  def qOovRate(s: SparkSession, d: String): DataFrame = {
    val toks = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
    val vocab = toks.groupBy(col("shingle").as("token"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(1000)
      .select(col("token"), lit(1L).as("in_v"))
    toks.select(col("doc_id"), col("shingle").as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr(ppmDiv("n_oov", "n_tokens")))
      .orderBy("doc_id")
  }

  /** The BPE ITERATE step [[qBpeMerges]] feeds (that query is the
    * round-1 COUNT step): apply the winning merge to the vocabulary and
    * re-count symbol pairs — one full train round, the piece the count
    * step alone doesn't exercise. Words become space-separated symbol sequences, the
    * winning pair (a 1-row broadcast argmax under the (weight, pair)
    * total order) is applied as leftmost non-overlapping string
    * replacement (`replace('a a a', 'a a', 'aa')` = 'aa a' — exactly
    * BPE's sequential-scan semantics, identical in both engines), and
    * the post-merge pair census keys on `sym1|sym2` (symbols are now
    * multi-char). Shapes: everything runs on the DISTINCT-word
    * vocabulary (the corpus collapsed once, as in round 1); the
    * winner is a bounded broadcast; TakeOrdered top-20 readout. */
  def qBpeApply(s: SparkSession, d: String): DataFrame = {
    val wc = TextOps.explodedShingles(Tables.documents(s, d), "doc_id", "text", 1)
      .groupBy(col("shingle").as("word")).agg(count(lit(1)).as("wf"))
      .where(length(col("word")) >= 2)
    val best = wc
      .select(col("wf"), explode(expr(
        "transform(sequence(0, length(word) - 2), i -> substr(word, i + 1, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wf")).as("weight"))
      .orderBy(col("weight").desc, col("pair")).limit(1)
      .select(expr("substr(pair, 1, 1)").as("c1"), expr("substr(pair, 2, 1)").as("c2"))
    wc.crossJoin(broadcast(best))
      .withColumn("merged", expr(
        "replace(array_join(split(word, ''), ' '), concat(c1, ' ', c2), concat(c1, c2))"))
      .withColumn("syms", split(col("merged"), " "))
      .where(size(col("syms")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> " +
          "concat(element_at(syms, i + 1), '|', element_at(syms, i + 2)))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wf")).as("weight"))
      .orderBy(col("weight").desc, col("pair")).limit(20)
  }

  /** Common-neighbor link prediction over the co-purchase graph — the
    * recommender/graph-completion primitive next to the triangle tier:
    * candidate pairs = two parts sharing a wedge center, scored by the
    * Jaccard of their neighborhoods, existing edges anti-joined away,
    * top-50 under the (score, pair) total order. The wedge expansion is
    * the LSH-bucket shape with the SAME degree-cap defense: only centers
    * of degree ≤ 50 pair their neighbors (a hub's wedge set is quadratic
    * pair mass contributing ~0 signal — the df-cap argument), and the
    * score is DEFINED over the capped graph so both engines agree
    * exactly; neighborhood sizes count capped-eligible neighbors,
    * consistent with the common count. */
  def qLinkPredict(s: SparkSession, d: String): DataFrame = {
    val (e, _) = coPurchaseGraph(s, d)
    val adj = e.select(col("pa").as("w"), col("pb").as("x"))
      .unionAll(e.select(col("pb").as("w"), col("pa").as("x")))
    val eligible = adj.join(
      adj.groupBy("w").agg(count(lit(1)).as("dw")).where(col("dw") <= 50)
        .select("w"), "w")
    val degc = eligible.groupBy("x").agg(count(lit(1)).as("degc"))
    eligible.as("a").join(eligible.as("b"),
        col("a.w") === col("b.w") && col("a.x") < col("b.x"))
      .groupBy(col("a.x").as("xa"), col("b.x").as("xb"))
      .agg(count(lit(1)).as("common"))
      .join(e.select(col("pa").as("xa"), col("pb").as("xb")),
        Seq("xa", "xb"), "left_anti")
      .join(degc.select(col("x").as("xa"), col("degc").as("da")), "xa")
      .join(degc.select(col("x").as("xb"), col("degc").as("db")), "xb")
      .withColumn("jaccard_ppm", expr(ppmDiv("common", "(da + db - common)")))
      .orderBy(col("jaccard_ppm").desc, col("xa"), col("xb"))
      .limit(50)
      .select("xa", "xb", "common", "jaccard_ppm")
  }

  /** Isotonic (PAV) calibration over the [[qBrierCalibration]] reliability
    * grid — the monotone recalibration a probabilistic model actually
    * ships: the isotonic fit at bin i is the minimax
    * `max_{j≤i} min_{k≥i} pooled-rate(j..k)` (the closed form of
    * pool-adjacent-violators), with every pooled rate an EXACT ppm from
    * integer (pos, n) prefix sums, so the fit is deterministic in both
    * engines (PAV over ppm-quantized rates — quantization is the
    * declared semantics, not an approximation). Shapes at 100 TB: the
    * corpus pass is the same single map-side ≤10-bin census as the
    * Brier query; ALL minimax work — (j,k) pooling pairs, the (i,j,k)
    * triples, both extremes — lives on broadcast frames bounded by
    * B = 10 bins (≤ 220 triple rows at any corpus size). */
  def qIsotonicCalibrate(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.embeddings(s, d)
      .select(expr("CAST(round(1.0D / (1.0D + exp(-4.0D * CAST(embedding[0] AS DOUBLE))) " +
        "* 10000, 0) AS BIGINT)").as("p_e4"),
        expr("CAST(label < 5 AS BIGINT)").as("y"))
      .withColumn("bin", expr("least(9L, p_e4 div 1000)"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins
      .withColumn("cn", sum(col("n")).over(wcum))
      .withColumn("cp", sum(col("pos")).over(wcum))
    val pairs = cum.as("j").join(broadcast(cum.as("k")),
        col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"),
        (col("k.cp") - col("j.cp") + col("j.pos")).as("pp"),
        (col("k.cn") - col("j.cn") + col("j.n")).as("nn"))
      .withColumn("ratio_ppm", expr(ppmDiv("pp", "nn")))
    val fit = bins.select(col("bin").as("i"))
      .join(broadcast(pairs), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min(col("ratio_ppm")).as("mn"))
      .groupBy("i").agg(max(col("mn")).as("iso_ppm"))
    bins.join(fit, col("bin") === col("i"))
      .withColumn("rate_ppm", expr(ppmDiv("pos", "n")))
      .select(col("bin"), col("n"), col("rate_ppm"), col("iso_ppm"))
      .transform(ps(col("bin")))
  }

  /** Fellegi–Sunter record-linkage weights — the probabilistic layer over
    * blocked entity resolution ([[qFuzzyMatch]]'s companion): each
    * field's u-probability is its random-agreement rate Σ(f_v/N)² (one
    * value-frequency census per field, exact ppm), the per-field
    * agree/disagree log-weights `ln(m/u)` / `ln((1−m)/(1−u))` (m = 0.9
    * declared; u clamped into [1, 999999] ppm so a constant or unique
    * field can never drive a log to ±∞ — an infinity would CAST
    * divergently between engines) are CONSTANTS snapped to e9 — so every pair's match score
    * is an exact integer sum of field constants. Candidate pairs come
    * from phone-prefix blocking with the LSH-style bucket cap (blocks
    * over 100 members are skipped BEFORE any pair exists — the quadratic
    * hub defense), and the readout is the top-50 scored pairs under the
    * (score, pair) total order. */
  def qErWeights(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey").as("id"),
      expr("c_custkey div 50").as("blk"),
      col("c_mktsegment").as("seg"),
      expr("c_nationkey").cast("long").as("nat"),
      expr("CAST(floor(c_acctbal / 1000.0D) AS BIGINT)").as("band"))
    val n1 = c.agg(count(lit(1)).as("nt"))
    def uPpm(field: String) = c.groupBy(field).agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("s2"))
      .crossJoin(broadcast(n1))
      .select(expr(ppmDiv("s2", "(nt * nt)")).as(s"u_$field"))
    val us = uPpm("seg").crossJoin(uPpm("nat")).crossJoin(uPpm("band"))
      .selectExpr(
        Seq("u_seg", "u_nat", "u_band").flatMap(u =>
          Seq(weightAgree(u), weightDisagree(u))): _*)
    val sizes = c.groupBy("blk").agg(count(lit(1)).as("bn"))
      .where(col("bn").between(2, 100)).select("blk")
    val blocked = c.join(sizes, "blk")
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (col("a.seg") === col("b.seg")).as("ag_seg"),
        (col("a.nat") === col("b.nat")).as("ag_nat"),
        (col("a.band") === col("b.band")).as("ag_band"))
      .crossJoin(broadcast(us))
      .withColumn("score_e9", expr(
        "(CASE WHEN ag_seg THEN wa_u_seg ELSE wd_u_seg END) + " +
          "(CASE WHEN ag_nat THEN wa_u_nat ELSE wd_u_nat END) + " +
          "(CASE WHEN ag_band THEN wa_u_band ELSE wd_u_band END)"))
      .select(col("id_a"), col("id_b"), col("score_e9"))
      .orderBy(col("score_e9").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** e9-snapped agree/disagree weight constants for one field from its
    * u ppm: `wa = round(ln(0.9/u)·1e9)`, `wd = round(ln(0.1/(1−u))·1e9)`
    * — row-local doubles from exact ppm integers, snapped before any
    * sum (the snap-then-sum doctrine). */
  private def weightAgree(uCol: String): String =
    s"CAST(round(ln(0.9D / (CAST(greatest(least($uCol, 999999L), 1L) AS DOUBLE) " +
      s"/ 1000000.0D)) * 1000000000, 0) AS BIGINT) AS wa_$uCol"
  private def weightDisagree(uCol: String): String =
    s"CAST(round(ln(0.1D / (1.0D - CAST(greatest(least($uCol, 999999L), 1L) AS DOUBLE) " +
      s"/ 1000000.0D)) * 1000000000, 0) AS BIGINT) AS wd_$uCol"

  /** Batch statement of
    * [[graft.streaming.EventStreams.runningTopKPerUser]]'s contract —
    * the `transformWithState` (Spark 4 arbitrary-state v2, RocksDB)
    * running top-3 of event values per user, as the user-keyed ranking
    * window it converges to after an AvailableNow replay (StreamingSpec
    * asserts the replay's final Update-mode emissions equal this frame).
    * The top-k of a value MULTISET is order-insensitive, so parity needs
    * no tie bookkeeping; cents are exact integers. User-keyed window,
    * O(users·k) output. */
  def qRunningTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("cents").desc, col("event_id"))
    Tables.events(s, d).where(col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select("user_id", "rank", "cents")
      .orderBy("user_id", "rank")
  }

  /** Neyman allocation — the survey-sampling DESIGN op behind
    * [[qStratifiedSample]]: a fixed budget of B = 1000 samples split
    * across strata ∝ N_h·S_h (size × spread buys the most variance
    * reduction). Spread is the population stddev from EXACT integer cent
    * moments (`n·Σx² − (Σx)²` — int64-safe past the 100× fixture),
    * rounded to e4 only at the weight; the integer allocation uses
    * LARGEST-REMAINDER apportionment (floor the quotas, hand the
    * leftover seats to the biggest remainders under a total order) so
    * the parts sum to EXACTLY B in both engines — no float rounding can
    * gain or lose a sample. One map-side census per stratum; all
    * apportionment windows on the ≤|strata| frame. */
  def qNeymanAlloc(s: SparkSession, d: String): DataFrame = {
    val B = 1000L
    val st = Tables.customer(s, d)
      .select(col("c_mktsegment").as("stratum"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_h"), sum(col("cents")).as("sx"),
        sum(col("cents") * col("cents")).as("sx2"))
      // weight_e4 = N_h · stddev_pop in e4 cents. The sqrt is continuous
      // (rounding-doctrine-safe) but the INT form n·Σx²−(Σx)² overflows
      // int64 past ~sf0.1, so the variance is composed in doubles with an
      // expression-identical op sequence in both engines (every operand
      // explicitly CAST — an int/int slip would be exact division in
      // Spark and integer division in DuckDB).
      .withColumn("w_e4", expr(
        "CAST(round(sqrt(CAST(sx2 AS DOUBLE) / CAST(n_h AS DOUBLE) - " +
          "(CAST(sx AS DOUBLE) / CAST(n_h AS DOUBLE)) * " +
          "(CAST(sx AS DOUBLE) / CAST(n_h AS DOUBLE))) * " +
          "CAST(n_h AS DOUBLE) * 10000.0D, 0) AS BIGINT)"))
    val tot = st.agg(sum(col("w_e4")).as("wt"))
    val quotas = st.crossJoin(broadcast(tot))
      .withColumn("q_num", col("w_e4") * lit(B))
      .withColumn("base", expr("q_num div wt"))
      .withColumn("rem", expr("q_num % wt"))
    val wrk = Window.orderBy(col("rem").desc, col("stratum"))
    val short = quotas.agg((lit(B) - sum(col("base"))).as("left1"))
    quotas.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(wrk).cast("long"))
      .withColumn("alloc", col("base") + when(col("rk") <= col("left1"), 1L).otherwise(0L))
      .select("stratum", "n_h", "w_e4", "base", "alloc")
      .transform(ps(col("stratum")))
  }

  /** Seasonal-naive forecast backtest — the baseline every forecasting
    * system must beat, evaluated honestly: forecast(day) = revenue(day−7),
    * scored over every day with a 7-day-lag observation by weekday-grouped
    * MAPE and bias (absolute/percentage errors in exact integer cents/ppm;
    * the division is the two-step exact ppm, the means round-half-up).
    * The daily census is map-side; the lag is ONE calendar-bounded window
    * (the day frame, not the fact table); output is the 7 ISO weekdays. */
  def qNaiveForecast(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("dte"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("a_c"))
    val wl = Window.orderBy("dte")
    val bt = daily
      .withColumn("f_c", lag(col("a_c"), 7).over(wl))
      .withColumn("dlag", lag(col("dte"), 7).over(wl))
      // the lag-7 ROW must be exactly 7 calendar days back (gaps disqualify)
      .where(col("f_c").isNotNull && expr("date_add(dlag, 7)") === col("dte"))
      .withColumn("ae_c", expr("abs(a_c - f_c)"))
      .withColumn("ape_ppm", expr(ppmDiv("ae_c", "a_c")))
    bt.groupBy(expr("CAST(weekday(dte) + 1 AS BIGINT)").as("isodow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("ae_c")).as("sum_ae_c"),
        sum(col("a_c") - col("f_c")).as("bias_c"),
        sum(col("ape_ppm")).as("sum_ape"))
      .withColumn("mape_ppm", expr(roundDiv("sum_ape", "n_days", 1L)))
      .select("isodow", "n_days", "sum_ae_c", "bias_c", "mape_ppm")
      .transform(ps(col("isodow")))
  }

  /** Exponential freshness decay — the recency weighting every trending /
    * feed-ranking surface applies ([[qEwmaDecay]] smooths a per-user
    * SERIES with an 8-tap FIR; this weights the whole log against
    * corpus-now for ranking mass): each event contributes
    * `exp(−age/τ)` (τ = 7 days) against the corpus max timestamp, the
    * per-event term a row-local double from exact µs integers SNAPPED to
    * e9 before the per-type sum (order-free integer aggregation), and the
    * freshness ratio (decayed mass / raw count) in exact ppm of e9 units.
    * The max-ts is a 1-row broadcast; the census map-side-combines. */
  def qFreshnessDecay(s: SparkSession, d: String): DataFrame = {
    val tauUs = 7L * 86400L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val mx = ev.agg(max(col("ts_us")).as("tmax"))
    ev.crossJoin(broadcast(mx))
      .withColumn("w_e9", expr(
        s"CAST(round(exp(-CAST(tmax - ts_us AS DOUBLE) / ${tauUs}.0D) * 1000000000, 0) " +
          "AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("w_e9")).as("decayed_e9"))
      .withColumn("fresh_ppm", expr(ppmDiv("decayed_e9", "(n * 1000000000)")))
      .transform(ps(col("event_type")))
  }

  /** Grouped top-3 shipments per part via the BOUNDED-BUFFER typed
    * aggregator ([[graft.functions.TopKAgg]]) — the scale path beside the
    * window formulation ([[qWindowTopk]]'s `row_number() ≤ k` shape): the
    * window must shuffle AND sort the whole fact table before discarding
    * all but k per group, while the aggregator truncates to k pairs per
    * group IN THE MAP TASKS, so the exchange carries k·|groups| rows at
    * any corpus size (DevHeavyTail measures the shuffle collapse —
    * SCALING.md). Total order (cents desc, row id asc); row id =
    * `orderkey·10 + linenumber` (linenumber ≤ 7 — collision-free and
    * engine-portable). */
  def qPartTopShipments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.TopKAgg(3).toColumn
    Tables.lineitem(s, d)
      .select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"),
        expr("l_orderkey * 10 + l_linenumber").as("rid"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("top"))
      .toDF("part", "top")
      .select(col("part"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("part"), (col("i") + 1).cast("long").as("rank"),
        col("p._1").as("cents"), col("p._2").as("rid"))
      .orderBy("part", "rank")
  }

  /** DuckDB restatement of [[qIpfRaking]]: the 5 declared raking rounds
    * unrolled as MATERIALIZED CTE pairs (each round's frame is referenced
    * twice — by its own margin sum and by the rescale — and DuckDB
    * re-derives inlined CTEs per reference; see the q_kcore adjudication). */
  /** [[qBradleyTerry]]'s oracle: the two MM iterations replayed as
    * materialized CTEs over the same basket-bounded pair census, all
    * arithmetic in the shared truncate-toward-zero integer division. */
  private[graft] lazy val btOracleSql: String = {
    val iter = (i: Int, prev: String) =>
      s"t$i AS MATERIALIZED (SELECT m.i, m.j, m.n_ij, " +
        s"(m.n_ij * 1000000000000) // (wi.w_e6 + wj.w_e6) AS t_e6 " +
        s"FROM m JOIN $prev wi ON wi.p = m.i JOIN $prev wj ON wj.p = m.j), " +
        s"d$i AS (SELECT p, CAST(sum(t_e6) AS BIGINT) AS d_e6 FROM " +
        s"(SELECT i AS p, t_e6 FROM t$i UNION ALL SELECT j AS p, t_e6 FROM t$i) " +
        s"GROUP BY 1), " +
        s"w$i AS (SELECT wt.p, CASE WHEN d_e6 = 0 THEN 1000000 ELSE " +
        s"(wt.wins * 1000000000000) // d_e6 END AS w_e6 " +
        s"FROM wt JOIN d$i ON d$i.p = wt.p)"
    "WITH li AS (SELECT l_orderkey AS k, l_partkey AS p, " +
      "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) " +
      "AS cents FROM lineitem GROUP BY 1, 2), " +
      "m AS (SELECT a.p AS i, b.p AS j, CAST(count(*) AS BIGINT) AS n_ij, " +
      "CAST(sum(CASE WHEN a.cents < b.cents THEN 0 ELSE 1 END) AS BIGINT) " +
      "AS wins_i FROM li a JOIN li b ON a.k = b.k AND a.p < b.p GROUP BY 1, 2), " +
      "wt AS (SELECT p, CAST(sum(w) AS BIGINT) AS wins, " +
      "CAST(count(*) AS BIGINT) AS n_opp FROM " +
      "(SELECT i AS p, wins_i AS w FROM m " +
      "UNION ALL SELECT j AS p, n_ij - wins_i AS w FROM m) GROUP BY 1), " +
      "w0 AS (SELECT p, CAST(1000000 AS BIGINT) AS w_e6 FROM wt), " +
      iter(1, "w0") + ", " + iter(2, "w1") + " " +
      "SELECT wt.p, wt.wins, wt.n_opp, w2.w_e6 FROM wt JOIN w2 ON w2.p = wt.p " +
      "ORDER BY w2.w_e6 DESC, wt.p LIMIT 20"
  }

  /** [[qLogisticStep]]'s oracle: the three GD iterations replayed as
    * materialized CTE chains — per-step census over the embedding scan
    * with the previous weights in scope, update by the shared
    * truncate-toward-zero `//`, weights re-snapped to e9 integers each
    * step so both engines stay bit-identical. */
  /** Shared WITH-fragment: the embedding cells plus the three GD-step
    * CTEs (final weights land in `w4pcte`) — composed by
    * [[logisticOracleSql]] and the [[qUncertaintySample]] oracle. */
  private lazy val logisticStepsCte: String = {
    val z = "CAST(w0 AS DOUBLE) / 1e9 + CAST(w1 AS DOUBLE) / 1e9 * x1 " +
      "+ CAST(w2 AS DOUBLE) / 1e9 * x2"
    def g(xj: String) =
      s"CAST(round((1.0 / (1.0 + exp(-($z))) - y) * $xj * 1000000000, 0) AS BIGINT)"
    val steps = (1 to 3).map { i =>
      val prev = if (i == 1) "w0cte" else s"w$i${"p"}cte"
      // census over cells with the previous weights in scope
      s"c$i AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, " +
        s"CAST(sum(${g("1.0")}) AS BIGINT) AS g0, " +
        s"CAST(sum(${g("x1")}) AS BIGINT) AS g1, " +
        s"CAST(sum(${g("x2")}) AS BIGINT) AS g2, " +
        s"CAST(min(w0) AS BIGINT) AS pw0, CAST(min(w1) AS BIGINT) AS pw1, " +
        s"CAST(min(w2) AS BIGINT) AS pw2 FROM cells CROSS JOIN $prev), " +
        s"w${i + 1}pcte AS (SELECT pw0 - g0 // n AS w0, pw1 - g1 // n AS w1, " +
        s"pw2 - g2 // n AS w2 FROM c$i)"
    }.mkString(", ")
    "cells AS (SELECT vec_id, CAST(label AS BIGINT) AS label, " +
      "CAST(embedding[1] AS DOUBLE) AS x1, " +
      "CAST(embedding[2] AS DOUBLE) AS x2, " +
      "CAST(CAST(label < 5 AS BIGINT) AS DOUBLE) AS y FROM embeddings), " +
      "w0cte AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, " +
      "CAST(0 AS BIGINT) AS w2), " + steps
  }

  private[graft] lazy val logisticOracleSql: String =
    "WITH " + logisticStepsCte + " " +
      "SELECT step, w0 AS w0_e9, w1 AS w1_e9, w2 AS w2_e9 FROM (" +
      (1 to 3).map(i => s"SELECT CAST($i AS BIGINT) AS step, w0, w1, w2 " +
        s"FROM w${i + 1}pcte").mkString(" UNION ALL ") +
      ") ORDER BY step"

  /** [[qUncertaintySample]]'s oracle: score with the step-3 weights and
    * take the 20 smallest exact-integer margins. */
  private[graft] lazy val uncertaintyOracleSql: String =
    "WITH " + logisticStepsCte + ", " +
      "scored AS (SELECT vec_id, label, CAST(round(1000000000 / (1.0 + " +
      "exp(-(CAST(w0 AS DOUBLE) / 1e9 + CAST(w1 AS DOUBLE) / 1e9 * x1 " +
      "+ CAST(w2 AS DOUBLE) / 1e9 * x2))), 0) AS BIGINT) AS p_e9 " +
      "FROM cells CROSS JOIN w4pcte) " +
      "SELECT vec_id, label, p_e9, abs(p_e9 - 500000000) AS margin_e9 " +
      "FROM scored ORDER BY margin_e9, vec_id LIMIT 20"

  /** [[qPagerankIter]]'s oracle: all [[PrCap]] integer rounds as
    * materialized CTEs; `converged = (max|Δ| = 0)` — for rounds past the
    * engine's early exit the dynamics reproduce identical ranks, so the
    * replay computes the same padded rows. */
  private[graft] lazy val pagerankOracleSql: String = {
    val rounds = (1 to PrCap).map { i =>
      val p = i - 1
      s"r$i AS MATERIALIZED (SELECT dst AS n, CAST(150000 + " +
        s"(85 * CAST(sum(r // d) AS BIGINT)) // 100 AS BIGINT) AS r " +
        s"FROM sym JOIN dg ON dg.src = sym.src JOIN r$p p$i ON p$i.n = sym.src " +
        s"GROUP BY dst), " +
        s"s$i AS (SELECT CAST(count(*) AS BIGINT) AS nn, " +
        s"CAST(sum(a.r) AS BIGINT) AS sr, " +
        s"CAST(max(abs(a.r - b.r)) AS BIGINT) AS md " +
        s"FROM r$i a JOIN r$p b ON a.n = b.n)"
    }.mkString(", ")
    "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
      "e0 AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
      "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey " +
      "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2), " +
      "sym AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0 " +
      "UNION ALL SELECT pb AS src, pa AS dst FROM e0), " +
      "dg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS d " +
      "FROM sym GROUP BY 1), " +
      "r0 AS (SELECT src AS n, CAST(1000000 AS BIGINT) AS r FROM dg), " +
      rounds + " " +
      (1 to PrCap).map { i =>
        s"SELECT CAST($i AS BIGINT) AS round, nn AS n_nodes, " +
          s"sr AS sum_rank_ppm, md AS max_delta_ppm, " +
          s"CAST(md = 0 AS BIGINT) AS converged FROM s$i"
      }.mkString(" UNION ALL ") + " ORDER BY round"
  }

  private[graft] lazy val ipfOracleSql: String = {
    val rescale = "(w // s) * t + ((w % s) * t) // s"
    val rounds = (1 to 5).map { i =>
      val prev = if (i == 1) "c0" else s"c${i - 1}"
      s"r$i AS MATERIALIZED (SELECT $prev.seg, nat, $rescale AS w FROM $prev " +
        s"JOIN (SELECT seg, CAST(sum(w) AS BIGINT) AS s FROM $prev GROUP BY 1) rs " +
        s"ON rs.seg = $prev.seg JOIN rt ON rt.seg = $prev.seg), " +
        s"c$i AS MATERIALIZED (SELECT seg, r$i.nat, $rescale AS w FROM r$i " +
        s"JOIN (SELECT nat, CAST(sum(w) AS BIGINT) AS s FROM r$i GROUP BY 1) cs " +
        s"ON cs.nat = r$i.nat JOIN ct ON ct.nat = r$i.nat)"
    }.mkString(", ")
    "WITH cust AS (SELECT c_custkey, c_mktsegment AS seg, " +
      "CAST(c_nationkey AS BIGINT) AS nat FROM customer), " +
      "resp AS (SELECT cust.* FROM cust JOIN (SELECT DISTINCT o_custkey FROM orders) o " +
      "ON o.o_custkey = cust.c_custkey), " +
      "c0 AS (SELECT seg, nat, CAST(count(*) * 1000 AS BIGINT) AS w FROM resp GROUP BY 1, 2), " +
      "rt AS (SELECT seg, CAST(count(*) * 1000 AS BIGINT) AS t FROM cust GROUP BY 1), " +
      "ct AS (SELECT nat, CAST(count(*) * 1000 AS BIGINT) AS t FROM cust GROUP BY 1), " +
      rounds + ", " +
      "n0 AS (SELECT seg, nat, CAST(count(*) AS BIGINT) AS n FROM resp GROUP BY 1, 2) " +
      "SELECT c5.seg, c5.nat, n, w AS w_e3, " +
      s"CAST(${ppmDivSql("w", "(n * 1000)")} AS BIGINT) AS factor_ppm " +
      "FROM c5 JOIN n0 ON n0.seg = c5.seg AND n0.nat = c5.nat ORDER BY c5.seg, c5.nat"
  }

  /** Iterative proportional fitting (raking) — the survey-weighting
    * algorithm behind every nonresponse adjustment: the (segment, nation)
    * census of customers WITH orders is reweighted until its margins
    * match the FULL customer population's margins (the subpopulation
    * "responded"; the population margins are known). Five
    * row-scale/column-scale rounds, every step EXACT integer arithmetic:
    * weights live in e3 units, each rescale is the overflow-safe
    * two-step `(w div S)·T + ((w mod S)·T) div S` (floor semantics,
    * declared), and margin sums are int64 — bit-identical in both
    * engines with no float products anywhere. Shapes at 100 TB: the two
    * corpus censuses are map-side; ALL raking rounds run on the bounded
    * ≤|segments|·|nations| cell grid (125 rows) — broadcast joins only.
    * Convergence to ~0.1 % in 5 rounds is typical for well-conditioned
    * margins; the round count is declared, not adaptive (the fixpoint
    * doctrine's materialized-CTE restatement). */
  def qIpfRaking(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("long").as("nat"))
    val responded = cust.join(
      Tables.orders(s, d).select(col("o_custkey").as("c_custkey")).distinct(),
      "c_custkey")
    var cells = responded.groupBy("seg", "nat")
      .agg((count(lit(1)) * 1000L).as("w"))
    val rowT = cust.groupBy("seg").agg((count(lit(1)) * 1000L).as("t_row"))
    val colT = cust.groupBy("nat").agg((count(lit(1)) * 1000L).as("t_col"))
    val rescale = "(w div s) * t + ((w % s) * t) div s"
    (1 to 5).foreach { _ =>
      val rs = cells.groupBy("seg").agg(sum(col("w")).as("s"))
      cells = cells.join(broadcast(rs), "seg").join(broadcast(rowT), "seg")
        .withColumn("w", expr(rescale.replace("t", "t_row")))
        .select("seg", "nat", "w")
      val cs = cells.groupBy("nat").agg(sum(col("w")).as("s"))
      cells = cells.join(broadcast(cs), "nat").join(broadcast(colT), "nat")
        .withColumn("w", expr(rescale.replace("t", "t_col")))
        .select("seg", "nat", "w")
        // per-round lineage cut (the fixpoint doctrine): without it the
        // 10-deep chained self-referencing join tree makes Catalyst
        // re-optimize the whole prefix per round — measured 70 s → ~2 s
        // on the 125-row grid
        .transform(Checkpoints.truncate)
    }
    val n0 = responded.groupBy("seg", "nat").agg(count(lit(1)).as("n"))
    cells.join(n0, Seq("seg", "nat"))
      .withColumn("factor_ppm", expr(ppmDiv("w", "(n * 1000)")))
      .select(col("seg"), col("nat"), col("n"), col("w").as("w_e3"),
        col("factor_ppm"))
      .transform(ps(col("seg"), col("nat")))
  }

  /** DuckDB restatement of [[qMarkovAttribution]]: the 16 declared power
    * iterations unrolled as MATERIALIZED CTEs over the (scenario, state)
    * grid (aggregation is illegal in a recursive CTE term, so the
    * fixpoint-as-unrolled-CTEs doctrine applies; each p_k is referenced
    * by the next round's join). Integer formula identical to the driver
    * loop: `Σ(P_ppm·p_e9) div 10⁶` with CONV pinned at 10⁹, NULL and the
    * removed channel at 0. */
  private[graft] lazy val markovOracleSql: String = {
    val iters = (1 to 16).map { k =>
      val prev = if (k == 1) "p0" else s"p${k - 1}"
      s"p$k AS MATERIALIZED (SELECT sc.removed, tp.src AS state, " +
        "CAST(CASE WHEN tp.src = sc.removed THEN 0 ELSE " +
        "CAST(sum(tp.p_ppm * (CASE WHEN tp.dst = 'CONV' THEN 1000000000 " +
        "WHEN tp.dst = 'NULL' THEN 0 WHEN tp.dst = sc.removed THEN 0 " +
        s"ELSE coalesce(pv.p, 0) END)) AS BIGINT) // 1000000 END AS BIGINT) AS p " +
        s"FROM tp CROSS JOIN scen sc LEFT JOIN $prev pv " +
        "ON pv.removed = sc.removed AND pv.state = tp.dst " +
        "GROUP BY sc.removed, tp.src)"
    }.mkString(", ")
    "WITH ev AS (SELECT user_id, event_id, event_type AS typ, epoch_us(ts) AS ts_us, " +
      "CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) " +
      "AS BIGINT) AS rk FROM events), " +
      "fp AS (SELECT user_id, min(rk) AS fp FROM ev WHERE typ = 'purchase' GROUP BY 1), " +
      "kept AS (SELECT ev.* FROM ev LEFT JOIN fp USING (user_id) " +
      "WHERE fp.fp IS NULL OR ev.rk <= fp.fp), " +
      "mp AS (SELECT user_id, rk, typ, lead(typ, 1) OVER " +
      "(PARTITION BY user_id ORDER BY rk) AS nxt FROM kept), " +
      "tr AS (SELECT typ AS src, CASE WHEN nxt = 'purchase' THEN 'CONV' " +
      "ELSE coalesce(nxt, 'NULL') END AS dst FROM mp WHERE typ <> 'purchase' " +
      "UNION ALL SELECT 'START' AS src, CASE WHEN typ = 'purchase' THEN 'CONV' " +
      "ELSE typ END AS dst FROM mp WHERE rk = 1), " +
      "cnt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2), " +
      "ot AS (SELECT src, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1), " +
      s"tp AS MATERIALIZED (SELECT cnt.src, dst, CAST(${ppmDivSql("c", "tot")} AS BIGINT) " +
      "AS p_ppm FROM cnt JOIN ot ON ot.src = cnt.src), " +
      "states AS (SELECT DISTINCT src FROM cnt), " +
      "scen AS MATERIALIZED (SELECT 'base' AS removed UNION ALL " +
      "SELECT src FROM states WHERE src <> 'START'), " +
      "p0 AS (SELECT sc.removed, s.src AS state, CAST(0 AS BIGINT) AS p " +
      "FROM scen sc CROSS JOIN states s), " +
      iters + ", " +
      "fin AS (SELECT removed, p FROM p16 WHERE state = 'START'), " +
      "base AS (SELECT p AS pb FROM fin WHERE removed = 'base'), " +
      "ch AS (SELECT removed AS channel, p AS pr FROM fin WHERE removed <> 'base'), " +
      "dr AS (SELECT channel, pb, pr, pb - pr AS drop_e9 FROM ch CROSS JOIN base), " +
      "td AS (SELECT CAST(sum(drop_e9) AS BIGINT) AS t FROM dr) " +
      "SELECT channel, pb AS p_base_e9, pr AS p_removed_e9, drop_e9, " +
      s"CAST(CASE WHEN t > 0 THEN ${ppmDivSql("drop_e9", "t")} ELSE 0 END AS BIGINT) " +
      "AS share_ppm FROM dr CROSS JOIN td ORDER BY channel"
  }

  /** Markov removal-effect attribution — the principled multi-touch model
    * next to the positional [[qAttribution]]: user journeys truncate at
    * the FIRST purchase (CONV absorbs; journeys without one absorb at
    * NULL), transitions count START→first / step→step / step→terminal,
    * and each channel's credit is its REMOVAL EFFECT — how much the
    * absorption probability P(CONV | START) drops when the channel is
    * deleted from the chain (transitions into it becoming NULL). The
    * corpus-sized work is entirely distributed (user-keyed rank/lead
    * windows + one map-side transition census); the chain itself is a
    * ≤|event types|+3-state matrix — a documented BOUNDED driver
    * round-trip (≤49 count rows, the IVF/MMR precedent) that runs 16
    * declared power iterations per scenario in EXACT integer arithmetic
    * (transition ppm via the two-step division, state values in e9,
    * `Σ(P_ppm·p_e9) div 10⁶` per step — the oracle replays the identical
    * iterations as materialized CTEs, proving the driver math
    * bit-equal). Output: per channel the base/removed conversion, the
    * drop, and the normalized share. */
  def qMarkovAttribution(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type").as("typ"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rk", row_number().over(wOrd).cast("long"))
    val fp = ev.where(col("typ") === "purchase")
      .groupBy("user_id").agg(min(col("rk")).as("fp"))
    val kept = ev.join(fp, Seq("user_id"), "left")
      .where(col("fp").isNull || col("rk") <= col("fp"))
    val wk = Window.partitionBy("user_id").orderBy("rk")
    val mapped = kept
      .withColumn("nxt_raw", lead(col("typ"), 1).over(wk))
      .withColumn("dst", when(col("nxt_raw") === "purchase", lit("CONV"))
        .otherwise(coalesce(col("nxt_raw"), lit("NULL"))))
    val trans = mapped.where(col("typ") =!= "purchase")
      .select(col("typ").as("src"), col("dst"))
    val starts = mapped.where(col("rk") === 1L)
      .select(lit("START").as("src"),
        when(col("typ") === "purchase", lit("CONV")).otherwise(col("typ")).as("dst"))
    val counts = trans.unionAll(starts).groupBy("src", "dst")
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // ---- bounded driver math (≤49 rows), exact integers throughout ----
    def ppmOf(n: Long, den: Long): Long =
      (n * 1000 / den) * 1000 + ((n * 1000 % den) * 1000) / den
    val outTot = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val pT = counts.map { case (s0, t0, c) => (s0, t0) -> ppmOf(c, outTot(s0)) }.toMap
    val states = counts.map(_._1).distinct.sorted
    val channels = states.filterNot(_ == "START").sorted
    def absorb(removed: Option[String]): Long = {
      var p = states.map(_ -> 0L).toMap
      (1 to 16).foreach { _ =>
        p = states.map { s0 =>
          s0 -> (if (removed.contains(s0)) 0L
          else {
            val acc = counts.filter(_._1 == s0).map { case (_, t0, _) =>
              val pv = t0 match {
                case "CONV" => 1000000000L
                case "NULL" => 0L
                case x if removed.contains(x) => 0L
                case x => p.getOrElse(x, 0L)
              }
              pT((s0, t0)) * pv
            }.sum
            acc / 1000000L
          })
        }.toMap
      }
      p("START")
    }
    val base = absorb(None)
    val rows = channels.map { ch =>
      val rem = absorb(Some(ch))
      (ch, base, rem, base - rem)
    }
    val totDrop = rows.map(_._4).sum
    import s.implicits._
    rows.toSeq.map { case (ch, b, r, drp) =>
      (ch, b, r, drp, if (totDrop > 0) ppmOf(drp, totDrop) else 0L)
    }.toDF("channel", "p_base_e9", "p_removed_e9", "drop_e9", "share_ppm")
      .orderBy("channel")
  }

  /** Temperature-scaling fit — the calibration REPAIR step that
    * [[qBrierCalibration]]'s gap column motivates and [[qIsotonicCalibrate]]
    * complements (temperature is the parametric, order-preserving fix;
    * isotonic the nonparametric one): grid-search τ ∈ {0.5, 0.6, …, 2.0}
    * minimizing the binary NLL of `sigmoid(4x/τ)` against the labels.
    * Each (row, τ) NLL term is row-local double work from exact inputs
    * SNAPPED to e9 before the per-τ sum (order-free integer totals), and
    * the winner is an exact `min(struct(nll, τ))` under a total order —
    * grid search is DECLARED semantics, so both engines agree exactly
    * (a gradient fit would converge engine-dependently). Shapes at
    * 100 TB: the 16-row τ grid rides a broadcast into one scan — the
    * expansion is row-local and combines map-side into 16 totals. */
  def qTemperatureFit(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.embeddings(s, d)
      .select(col("embedding").getItem(0).cast("double").as("x"),
        expr("CAST(label < 5 AS BIGINT)").as("y"))
    val grid = s.range(16).toDF("i")
      .select((col("i") + 5).cast("long").as("tau_e1"))
    val terms = cells.crossJoin(broadcast(grid))
      .withColumn("nll_e9", expr(
        "CAST(round(-(CAST(y AS DOUBLE) * ln(1.0D / (1.0D + exp(-4.0D * x " +
          "/ (CAST(tau_e1 AS DOUBLE) / 10.0D)))) + (1.0D - CAST(y AS DOUBLE)) " +
          "* ln(1.0D - 1.0D / (1.0D + exp(-4.0D * x / (CAST(tau_e1 AS DOUBLE) " +
          "/ 10.0D))))) * 1000000000, 0) AS BIGINT)"))
    val byTau = terms.groupBy("tau_e1")
      .agg(count(lit(1)).as("n"), sum(col("nll_e9")).as("nll_sum_e9"))
    val best = byTau.agg(min(struct(col("nll_sum_e9"), col("tau_e1"))).as("b"))
      .select(col("b.tau_e1").as("best_tau"))
    byTau.crossJoin(broadcast(best))
      .withColumn("is_best", (col("tau_e1") === col("best_tau")).cast("bigint"))
      .select("tau_e1", "n", "nll_sum_e9", "is_best")
      .transform(ps(col("tau_e1")))
  }

  /** Jaro-Winkler entity-resolution pass over the part-name vocabulary —
    * the record-linkage scoring step, exercising the native
    * [[graft.functions.JaroWinkler]] expression (codegen'd static kernel;
    * Spark ships no prefix-weighted edit metric). Names dedupe to their
    * VOCABULARY first (64 adjective×noun combinations, saturated by
    * sf0.01 — FIXTURES.md), so the pair frame is vocab-bounded at any
    * fact scale; blocking on the trailing noun keeps candidates to
    * same-category names (the [[qFuzzyMatch]] discipline, which scores
    * the Levenshtein tier of the same problem). Each surviving pair
    * carries both sides' part support — the merge-decision weight an ER
    * pipeline needs downstream. */
  def qJaroEr(s: SparkSession, d: String): DataFrame = {
    import graft.functions.JaroWinkler.jaro_winkler
    val names = Tables.part(s, d)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("noun", expr("element_at(split(p_name, ' '), -1)"))
    val a = names.select(col("p_name").as("name_a"), col("n_parts").as("n_a"),
      col("noun"))
    val b = names.select(col("p_name").as("name_b"), col("n_parts").as("n_b"),
      col("noun"))
    a.join(b, Seq("noun"))
      .where(col("name_a") < col("name_b"))
      .withColumn("jw_e9",
        round(jaro_winkler(col("name_a"), col("name_b")) * lit(1000000000L), 0)
          .cast("bigint"))
      .select("name_a", "name_b", "n_a", "n_b", "jw_e9")
      .where(col("jw_e9") >= 800000000L)
      .orderBy(col("jw_e9").desc, col("name_a"), col("name_b"))
  }

  /** Exact Shapley-value channel attribution over the four non-conversion
    * event channels (click/error/signup/view → bits 0-3, alphabetical;
    * purchase = conversion). The coalition game is `v(S) = converted
    * users whose touched-channel set ⊆ S` — monotone by construction, so
    * every marginal `v(S∪{i}) − v(S)` is ≥ 0 and the exact factorial
    * weights `w(|S|) = |S|!·(3−|S|)! ∈ {6,2,2,6}` (denominator 4! = 24)
    * keep the whole computation in integers: `Σ_i φ_i·24 = 24·(v(full) −
    * v(∅))` (the efficiency axiom, asserted in QueriesSpec; shares
    * normalize by v(full) − v(∅) — NOT v(full) alone — so the axiom holds
    * even if a converted purchase-only user ever makes v(∅) > 0, instead
    * of relying on fixture luck). Shapes at 100 TB:
    * one user-keyed census (the only data-sized shuffle), then a ≤16-row
    * mask census against a 16-row subset grid and a 4-row channel frame —
    * every post-census join is broadcast of a bounded frame. Contrast
    * [[qMarkovAttribution]] (removal-effect on the transition matrix) and
    * [[qAttribution]] (positional rules): three attribution doctrines,
    * one census shape. */
  def qShapleyAttribution(s: SparkSession, d: String): DataFrame = {
    val user = Tables.events(s, d).select(col("user_id"),
        expr("CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 " +
          "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END").as("bit"),
        expr("CAST(event_type = 'purchase' AS INT)").as("pur"))
      .groupBy(col("user_id"))
      .agg(expr("CAST(bit_or(bit) AS BIGINT)").as("mask"),
        expr("CAST(max(pur) AS BIGINT)").as("conv"))
    val maskCensus = user.groupBy(col("mask"))
      .agg(sum(col("conv")).as("conv_n"))
    val subsets = s.range(16).toDF("s")
    val v = broadcast(subsets)
      .join(broadcast(maskCensus), expr("(mask & s) = mask"), "left")
      .groupBy(col("s"))
      .agg(coalesce(sum(col("conv_n")), lit(0L)).as("v"))
    val channels = s.range(4).toDF("i")
      .withColumn("channel", expr(
        "CASE i WHEN 0 THEN 'click' WHEN 1 THEN 'error' " +
          "WHEN 2 THEN 'signup' ELSE 'view' END"))
    val phi = broadcast(channels)
      .join(broadcast(v.as("lo")), expr("(shiftright(lo.s, CAST(i AS INT)) & 1) = 0"))
      .join(broadcast(v.as("hi")),
        expr("hi.s = (lo.s | shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)))"))
      .withColumn("w", expr(
        "CASE WHEN bit_count(lo.s) IN (0, 3) THEN 6 ELSE 2 END"))
      .groupBy(col("channel"))
      .agg(sum(expr("w * (hi.v - lo.v)")).as("phi_x24"))
    val tot = v.agg((sum(when(col("s") === 15L, col("v"))
      .when(col("s") === 0L, -col("v")).otherwise(lit(0L))) * 24L).as("tot_x24"))
    phi.crossJoin(broadcast(tot))
      .select(col("channel"), col("phi_x24"),
        expr(s"CASE WHEN tot_x24 = 0 THEN 0 ELSE CAST(${ppmDiv("phi_x24", "tot_x24")} AS BIGINT) END")
          .as("share_ppm"))
      .transform(ps(col("channel")))
  }

  /** A-Priori frequent-triple mining over order baskets (items =
    * distinct parts per order, the [[qPartAffinity]] basket model one
    * level deeper): L2 = pairs with support ≥ 2, candidate triples
    * joined from L2 pairs sharing their first item with the third pair
    * membership-pruned (the anti-monotone step — a triple can reach
    * support 2 only if all three of its pairs did), then true support
    * counted with every join leg restricted to L2 pairs. Lossless vs the
    * brute enumeration (the oracle IS the brute enumeration) because
    * support is anti-monotone. Shapes at 100 TB: basket sizes are
    * bounded (~5 lines/order at every sf), so the per-basket pair
    * expansion is a constant factor on the fact table — the pair mass is
    * fact-LINEAR, not quadratic — and L2/candidates are
    * frequency-pruned frames that broadcast. */
  def qFrequentTriples(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val pairOcc = op.as("a")
      .join(op.as("b"), expr("a.k = b.k AND a.p < b.p"))
      .select(col("a.k").as("k"), col("a.p").as("pa"), col("b.p").as("pb"))
    val l2 = pairOcc.groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("supp2"))
      .where(col("supp2") >= 2L)
      .select("pa", "pb")
    val cand = l2.as("x")
      .join(l2.as("y"), expr("x.pa = y.pa AND x.pb < y.pb"))
      .select(col("x.pa").as("ca"), col("x.pb").as("cb"), col("y.pb").as("cc"))
      .join(broadcast(l2.select(col("pa").as("cb"), col("pb").as("cc"))),
        Seq("cb", "cc"), "left_semi")
    val occ2 = pairOcc.join(broadcast(l2), Seq("pa", "pb"), "left_semi")
    occ2.as("o2").join(op.as("c"), expr("o2.k = c.k AND o2.pb < c.p"))
      .select(col("o2.pa").as("pa"), col("o2.pb").as("pb"), col("c.p").as("pc"))
      .join(broadcast(cand.select(col("ca").as("pa"), col("cb").as("pb"),
        col("cc").as("pc"))), Seq("pa", "pb", "pc"), "left_semi")
      .groupBy(col("pa"), col("pb"), col("pc"))
      .agg(count(lit(1)).as("supp"))
      .where(col("supp") >= 2L)
      .orderBy("pa", "pb", "pc")
  }

  /** CUPED variance reduction for the A/B readout ([[qAbtestChi2]] /
    * [[qAbQuantiles]] are the test tier; this is the sensitivity tier):
    * pre-period covariate X = each user's value mass before Jan 16,
    * experiment metric Y = mass after; θ = cov(X,Y)/var(X) pooled across
    * arms, adjusted metric `Y − θX` (the X̄ recentering shifts both arms
    * identically and cancels in the arm contrast, so it is omitted).
    * Every per-event value snaps to e3 BEFORE summing (order-free exact
    * user aggregates); the centered second moments `n·Sxy − Sx·Sy` etc.
    * are exact DECIMAL(38,0) products of long sums (they overflow a long
    * at fleet scale), and θ_e9 plus the realized variance-reduction ρ²
    * are presented through byte-identical double expressions from those
    * exact integers in both engines. Shapes at 100 TB: one user-keyed
    * census (the only data-sized shuffle), a 1-row pooled moment frame
    * broadcast back over the 2-row arm census — the adjustment never
    * rescans events. */
  def qCuped(s: SparkSession, d: String): DataFrame = {
    val user = Tables.events(s, d).select(
        (col("user_id") % 2).as("arm"), col("user_id"),
        expr("CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN " +
          "CAST(round(value * 1000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("xv"),
        expr("CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN " +
          "CAST(round(value * 1000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("yv"))
      .groupBy(col("arm"), col("user_id"))
      .agg(sum(col("xv")).as("x"), sum(col("yv")).as("y"))
    val pooled = user.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("syy"))
      .select(col("n"), col("sx"), col("sy"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))").as("cxx"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))").as("cxy"),
        expr("CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))").as("cyy"))
      .select(
        expr("CASE WHEN cxx = 0 THEN 0 ELSE CAST(round(CAST(cxy AS DOUBLE) " +
          "/ CAST(cxx AS DOUBLE) * 1000000000, 0) AS BIGINT) END").as("theta_e9"),
        expr("CASE WHEN cxx = 0 OR cyy = 0 THEN 0 ELSE CAST(round(" +
          "CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE) / (CAST(cxx AS DOUBLE) " +
          "* CAST(cyy AS DOUBLE)) * 1000000, 0) AS BIGINT) END").as("varred_ppm"))
    user.crossJoin(broadcast(pooled))
      // per-row product in DECIMAL(38,0) like the moment sums above: the
      // BIGINT form wraps silently (non-ANSI) once a user's e3 value mass
      // passes ~9.2e9, exactly where DuckDB would error instead
      .withColumn("adj12", expr("CAST(y AS DECIMAL(38,0)) * 1000000000 " +
        "- CAST(theta_e9 AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))"))
      .groupBy(col("arm"), col("theta_e9"), col("varred_ppm"))
      .agg(count(lit(1)).as("n_users"), sum(col("y")).as("sy"),
        sum(col("adj12")).as("sadj"))
      .select(col("arm"), col("n_users"),
        expr(s"CAST(${roundDiv("sy", "n_users", 1000L)} AS BIGINT)").as("mean_raw_e6"),
        expr("CAST(round(CAST(sadj AS DOUBLE) / CAST(n_users AS DOUBLE) " +
          "/ 1000000.0, 0) AS BIGINT)").as("mean_adj_e6"),
        col("theta_e9"), col("varred_ppm"))
      .transform(ps(col("arm")))
  }

  /** Closed-form two-feature OLS via the normal equations — multiple
    * regression as ONE map-side census ([[qRegrTrend]] is the
    * single-feature tier): y = price dollars on x₁ = quantity, x₂ =
    * discount e2. The nine raw power sums are exact longs; the centered
    * (×n) second moments `n·Sxy − Sx·Sy` are exact DECIMAL(38,0)/HUGEINT
    * products (they pass 2⁶³ at fleet scale); the Cramer solve, intercept
    * and R² are byte-identical double expressions from those exact
    * integers — the engines agree because the INPUTS are bit-equal and
    * the IEEE op sequence is shared. Shapes at 100 TB: one scan, nine
    * map-side-combined totals, a 1-row solve — no second pass, no
    * gradient loop, no shuffle beyond the single-row aggregate. */
  def qOlsClosed(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d).select(
      expr("CAST(l_quantity AS BIGINT)").as("x1"),
      expr("CAST(round(l_discount * 100, 0) AS BIGINT)").as("x2"),
      expr("CAST(round(l_extendedprice, 0) AS BIGINT)").as("y"))
    val dec = "CAST(%s AS DECIMAL(38,0))"
    cells.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
        sum(expr("x1 * x1")).as("s11"), sum(expr("x1 * x2")).as("s12"),
        sum(expr("x2 * x2")).as("s22"), sum(expr("x1 * y")).as("s1y"),
        sum(expr("x2 * y")).as("s2y"), sum(expr("y * y")).as("syy"))
      .select(col("n"),
        expr(s"${dec.format("n")} * ${dec.format("s11")} - ${dec.format("s1")} * ${dec.format("s1")}").as("a11"),
        expr(s"${dec.format("n")} * ${dec.format("s12")} - ${dec.format("s1")} * ${dec.format("s2")}").as("a12"),
        expr(s"${dec.format("n")} * ${dec.format("s22")} - ${dec.format("s2")} * ${dec.format("s2")}").as("a22"),
        expr(s"${dec.format("n")} * ${dec.format("s1y")} - ${dec.format("s1")} * ${dec.format("sy")}").as("b1"),
        expr(s"${dec.format("n")} * ${dec.format("s2y")} - ${dec.format("s2")} * ${dec.format("sy")}").as("b2"),
        expr(s"${dec.format("n")} * ${dec.format("syy")} - ${dec.format("sy")} * ${dec.format("sy")}").as("cyy"),
        col("s1"), col("s2"), col("sy"))
      .withColumn("det", expr("CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)"))
      .withColumn("beta1d", expr("(CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det"))
      .withColumn("beta2d", expr("(CAST(b2 AS DOUBLE) * CAST(a11 AS DOUBLE) " +
        "- CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det"))
      .select(col("n"),
        expr("CAST(round(beta1d * 1000000, 0) AS BIGINT)").as("beta_qty_e6"),
        expr("CAST(round(beta2d * 1000000, 0) AS BIGINT)").as("beta_disc_e6"),
        expr("CAST(round((CAST(sy AS DOUBLE) - beta1d * CAST(s1 AS DOUBLE) " +
          "- beta2d * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE) * 1000, 0) " +
          "AS BIGINT)").as("intercept_e3"),
        expr("CAST(round((beta1d * CAST(b1 AS DOUBLE) + beta2d * CAST(b2 AS DOUBLE)) " +
          "/ CAST(cyy AS DOUBLE) * 1000000, 0) AS BIGINT)").as("r2_ppm"))
  }

  /** Three declared gradient-descent steps of two-feature logistic
    * regression ([[qKmeansStep]] is the clustering iterate; this is the
    * GLM one): y = (label < 5) on the first two embedding dims, weights
    * carried as e9 integers so every step RE-SNAPS to a bit-identical
    * state in both engines (a float weight would accumulate engine
    * drift). Per step: the sigmoid residual terms are row-local doubles
    * from exact broadcast weights, e9-snapped BEFORE the sum (order-free
    * integer gradients), and the update `w −= Σg div n` uses the shared
    * truncate-toward-zero integer division. Shapes at 100 TB: each step
    * is one scan with three map-side-combined totals and a 1-row weight
    * broadcast — the classic distributed-GD shape; iterating further =
    * looping this plan with the checkpoint discipline. */
  def qLogisticStep(s: SparkSession, d: String): DataFrame = {
    // emit all three states: replaying the fold per step costs 1+2+3 scans
    // and keeps the query a pure DataFrame — no driver math, no collect
    val states = (1 to 3).map(k => logisticFold(s, d, k))
    states.reduce(_ unionByName _)
      .select(col("step"), col("w0").as("w0_e9"), col("w1").as("w1_e9"),
        col("w2").as("w2_e9"))
      .transform(ps(col("step")))
  }

  /** The [[qLogisticStep]] embedding frame: first two dims + binary label. */
  private def logisticCells(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      expr("CAST(embedding[0] AS DOUBLE)").as("x1"),
      expr("CAST(embedding[1] AS DOUBLE)").as("x2"),
      expr("CAST(CAST(label < 5 AS BIGINT) AS DOUBLE)").as("y"))

  /** k snapped GD steps of the 2-feature logistic fit — the shared iterate
    * behind [[qLogisticStep]] (all three states) and
    * [[qUncertaintySample]] (final weights as the scoring model). */
  private def logisticFold(s: SparkSession, d: String, k: Int): DataFrame = {
    val cells = logisticCells(s, d)
    val g = (w: String, xj: String) => // e9-snapped per-row gradient term
      s"CAST(round((1.0D / (1.0D + exp(-($w))) - y) * $xj * 1000000000, 0) AS BIGINT)"
    def stepOnce(w: DataFrame, i: Int): DataFrame = {
      val z = "CAST(w0 AS DOUBLE) / 1e9 + CAST(w1 AS DOUBLE) / 1e9 * x1 " +
        "+ CAST(w2 AS DOUBLE) / 1e9 * x2"
      cells.crossJoin(broadcast(w))
        .agg(count(lit(1)).as("n"),
          sum(expr(g(z, "1.0D"))).as("g0"), sum(expr(g(z, "x1"))).as("g1"),
          sum(expr(g(z, "x2"))).as("g2"),
          first(col("w0")).as("w0"), first(col("w1")).as("w1"),
          first(col("w2")).as("w2"))
        .select(expr("w0 - g0 div n").as("w0"), expr("w1 - g1 div n").as("w1"),
          expr("w2 - g2 div n").as("w2"), lit(i.toLong).as("step"))
    }
    val w0row = s.sql("SELECT CAST(0 AS BIGINT) w0, CAST(0 AS BIGINT) w1, " +
      "CAST(0 AS BIGINT) w2, CAST(0 AS BIGINT) step")
    (1 to k).foldLeft(w0row)(stepOnce)
  }

  /** Merkle-style two-level table diff — the replica-reconciliation step
    * [[qTableChecksum]] motivates and [[qSnapshotDiff]] brute-forces:
    * both versions summarize into 256 md5-keyed buckets (count + XOR'd
    * 60-bit row hashes, all map-side-combinable), the bucket summaries
    * join to name the DIRTY buckets, and only rows hashing into a dirty
    * bucket enter the row-grain full-outer diff (broadcast semi-join
    * filter). At 100 TB with a 0.1 % drift rate this is the difference
    * between shuffling two full tables and shuffling ~the changed rows:
    * the checksum pass is map-side, the diff pass is drift-proportional.
    * Version deltas are declared arithmetic on the shared fixture
    * (adds ≡ 0 mod 1013, drops ≡ 0 mod 1009, cent bumps ≡ 0 mod 997). */
  def qMerkleDiff(s: SparkSession, d: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the fixture — collapse to
    // one exact-cent payload per rid so the diff has a true key
    val base = Tables.lineitem(s, d).select(
      expr("l_orderkey * 10 + l_linenumber").as("rid"),
      expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("rid")).agg(sum(col("cents")).as("cents"))
    val old = base.where(expr("rid % 1013 != 0"))
    val nw = base.where(expr("rid % 1009 != 0"))
      .select(col("rid"),
        expr("cents + CASE WHEN rid % 997 = 0 THEN 100 ELSE 0 END").as("cents"))
    val bucketOf = "CAST(conv(substr(md5(CAST(rid AS STRING)), 1, 2), 16, 10) AS BIGINT)"
    def summarize(df: DataFrame): DataFrame = df.select(
        expr(bucketOf).as("bucket"),
        expr("CAST(conv(substr(md5(concat_ws('|', rid, cents)), 1, 15), 16, 10) " +
          "AS BIGINT)").as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("ck"))
    val dirty = summarize(old)
      .select(col("bucket"), col("n").as("old_n"), col("ck").as("old_ck"))
      .join(summarize(nw)
        .select(col("bucket"), col("n").as("new_n"), col("ck").as("new_ck")),
        Seq("bucket"), "full_outer")
      .where(expr("old_n IS DISTINCT FROM new_n OR old_ck IS DISTINCT FROM new_ck"))
      .select(col("bucket"), coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
    def keyed(df: DataFrame, cn: String): DataFrame = df
      .select(expr(bucketOf).as("bucket"), col("rid"), col("cents").as(cn))
      .join(broadcast(dirty.select(col("bucket"))), Seq("bucket"), "left_semi")
    val diff = keyed(old, "old_c")
      .join(keyed(nw, "new_c"), Seq("bucket", "rid"), "full_outer")
      .groupBy(col("bucket"))
      .agg(sum(expr("CAST(old_c IS NULL AS BIGINT)")).as("n_added"),
        sum(expr("CAST(new_c IS NULL AS BIGINT)")).as("n_removed"),
        sum(expr("CAST(old_c IS NOT NULL AND new_c IS NOT NULL " +
          "AND old_c != new_c AS BIGINT)")).as("n_changed"))
    dirty.join(diff, Seq("bucket"), "left")
      .select(expr("bucket div 16").as("super"), col("bucket"),
        col("old_n"), col("new_n"),
        coalesce(col("n_added"), lit(0L)).as("n_added"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_changed"), lit(0L)).as("n_changed"))
      .orderBy(col("bucket"))
  }

  /** Sequential probability ratio test over the event stream — the
    * always-valid sequential tier beside the fixed-horizon
    * [[qAbtestChi2]]: H₀ purchase-rate 0.18 vs H₁ 0.22, α = β = 0.05.
    * Per-trial log-likelihood increments are HARDCODED e9 integers
    * (ln(22/18), ln(78/82) — no cross-engine `ln` anywhere), trials run
    * in event-id order (the declared ingest sequence), and the running
    * LLR is the two-phase scalable prefix sum
    * ([[graft.operators.Ops.prefixSumScalable]] — bucket bases + local
    * windows, never a single-task global window). The verdict is the
    * first boundary crossing (±ln 19 ≈ ±2.944·10⁹ e9) by exact
    * `min(struct(trial, …))`, or `continue` with the final LLR when the
    * walk never exits. Always exactly one row. */
  def qSprt(s: SparkSession, d: String): DataFrame = {
    val trials = Tables.events(s, d).select(col("event_id"),
      expr("CASE WHEN event_type = 'purchase' THEN CAST(200670695 AS BIGINT) " +
        "ELSE CAST(-50010421 AS BIGINT) END").as("llr_e9"))
    val ranked = Ops.globalRowNumberScalable(
      Ops.prefixSumScalable(trials, "event_id", "llr_e9", "cum_excl"),
      "event_id", Seq.empty, "trial")
      .withColumn("cum_e9", col("cum_excl") + col("llr_e9"))
    val bound = 2944438979L
    val crossed = ranked
      .where(col("cum_e9") >= bound || col("cum_e9") <= -bound)
      .agg(min(struct(col("trial"), col("cum_e9"))).as("c"))
      .select(col("c.trial").as("c_trial"), col("c.cum_e9").as("c_cum"))
    val tot = trials.agg(count(lit(1)).as("n_trials"),
      sum(col("llr_e9")).as("final_llr_e9"))
    tot.crossJoin(broadcast(crossed))
      .select(
        expr("CASE WHEN c_trial IS NULL THEN 'continue' " +
          s"WHEN c_cum >= $bound THEN 'accept_h1' ELSE 'accept_h0' END")
          .as("decision"),
        coalesce(col("c_trial"), col("n_trials")).as("n_at_decision"),
        coalesce(col("c_cum"), col("final_llr_e9")).as("llr_e9"),
        col("n_trials"))
  }

  /** Lead-lag cross-correlation between daily order volume and daily
    * revenue at lags −7…+7 — the alignment diagnostic [[qRollingCorr]]'s
    * same-day windows cannot see (does volume LEAD revenue?). One
    * map-side daily census (calendar-bounded), then every lagged pairing
    * is a broadcast join of that tiny frame against the 15-row lag grid;
    * Pearson r per lag from exact-integer sums (products in
    * DECIMAL(38,0)/HUGEINT) presented through the shared
    * `num / sqrt(d1·d2)` double expression — IEEE sqrt is correctly
    * rounded, so the engines agree bit-for-bit before the e6 snap. */
  def qXcorrLeadlag(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice, 0) AS BIGINT) div 1000")).as("y"))
    val lags = s.range(-7, 8).toDF("lag")
    val dec = "CAST(%s AS DECIMAL(38,0))"
    broadcast(daily.as("a")).crossJoin(broadcast(lags))
      .join(broadcast(daily.as("b")),
        expr("b.day = date_add(a.day, CAST(lag AS INT))"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("a.x")).as("sx"), sum(col("b.y")).as("sy"),
        sum(expr(s"${dec.format("a.x")} * ${dec.format("a.x")}")).as("sxx"),
        sum(expr(s"${dec.format("b.y")} * ${dec.format("b.y")}")).as("syy"),
        sum(expr(s"${dec.format("a.x")} * ${dec.format("b.y")}")).as("sxy"))
      .select(col("lag"), col("n_days"),
        expr(s"${dec.format("n_days")} * sxy - ${dec.format("sx")} * ${dec.format("sy")}").as("num"),
        expr(s"${dec.format("n_days")} * sxx - ${dec.format("sx")} * ${dec.format("sx")}").as("d1"),
        expr(s"${dec.format("n_days")} * syy - ${dec.format("sy")} * ${dec.format("sy")}").as("d2"))
      .select(col("lag"), col("n_days"),
        expr("CASE WHEN d1 = 0 OR d2 = 0 THEN 0 ELSE " +
          "CAST(round(CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE) " +
          "* CAST(d2 AS DOUBLE)) * 1000000, 0) AS BIGINT) END").as("r_e6"))
      .transform(ps(col("lag")))
  }

  /** McNemar's test for paired binary outcomes — did each user's
    * error-proneness CHANGE between the two calendar halves? (The paired
    * tier beside the independent-sample [[qAbtestChi2]].) One user census
    * builds the 2×2 discordance table; the statistic `(b−c)²/(b+c)` and
    * its continuity-corrected form are exact integer ratios (round-half-up
    * e6). Shapes at 100 TB: one user-keyed census, then a single-row
    * readout — nothing else. */
  def qMcnemar(s: SparkSession, d: String): DataFrame = {
    val user = Tables.events(s, d).groupBy(col("user_id"))
      .agg(expr("max(CASE WHEN event_type = 'error' AND " +
        "ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END)").as("a"),
        expr("max(CASE WHEN event_type = 'error' AND " +
          "ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END)").as("b"))
    user.agg(count(lit(1)).as("n_users"),
        sum(expr("CAST(a = 1 AND b = 0 AS BIGINT)")).as("n_ab"),
        sum(expr("CAST(a = 0 AND b = 1 AS BIGINT)")).as("n_ba"))
      .select(col("n_users"), col("n_ab"), col("n_ba"),
        expr("CASE WHEN n_ab + n_ba = 0 THEN 0 ELSE " +
          s"CAST(${roundDiv("((n_ab - n_ba) * (n_ab - n_ba))", "(n_ab + n_ba)", 1000000L)} " +
          "AS BIGINT) END").as("mcnemar_e6"),
        expr("CASE WHEN n_ab + n_ba = 0 THEN 0 ELSE " +
          s"CAST(${roundDiv("(greatest(abs(n_ab - n_ba) - 1, 0) * greatest(abs(n_ab - n_ba) - 1, 0))",
            "(n_ab + n_ba)", 1000000L)} AS BIGINT) END").as("mcnemar_cc_e6"))
  }

  /** Leave-one-source-out jackknife over the corpus — which source PULLS
    * the pooled document-length profile, the ablation readout a curation
    * loop wants before dropping a source ([[qJsSources]] measures
    * distributional distance; this measures pooled-metric influence).
    * Everything derives from ONE |sources|-row census of exact integer
    * character masses: pooled mean, each leave-one-out mean, and the
    * influence delta are round-half-up e3 ratios of exact longs. */
  def qJackknifeSources(s: SparkSession, d: String): DataFrame = {
    val bySrc = Tables.documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val pooled = bySrc.agg(sum(col("n_docs")).as("nn"), sum(col("chars")).as("ss"))
    bySrc.crossJoin(broadcast(pooled))
      .select(col("source"), col("n_docs"),
        expr(s"CAST(${roundDiv("ss", "nn", 1000L)} AS BIGINT)").as("pooled_mean_e3"),
        expr(s"CAST(${roundDiv("(ss - chars)", "(nn - n_docs)", 1000L)} AS BIGINT)")
          .as("loo_mean_e3"))
      .withColumn("influence_e3", col("loo_mean_e3") - col("pooled_mean_e3"))
      .transform(ps(col("source")))
  }

  /** Bradley-Terry strength fitting from pairwise outcomes — the
    * arena-style model-ranking computation an LLM-eval pipeline runs on
    * preference pairs ([[qPreferencePairs]] mines them; this fits the
    * latent strengths): within each order every part pair "competes"
    * (winner = higher exact cents, tie → lower key — declared), and two
    * declared MM iterations `w'_i = W_i / Σ_j n_ij/(w_i+w_j)` run in e6
    * integer arithmetic (per-pair terms `n_ij·10¹² div (w_i+w_j)` — the
    * truncate-toward-zero division both engines share; no normalization,
    * strengths are scale-free by declaration). Shapes at 100 TB: pair
    * mass is basket-bounded (fact-LINEAR); each iteration is two
    * item-keyed equi-joins of the pair census against the strength
    * table + one map-side census; readout is TakeOrdered top-20. */
  def qBradleyTerry(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey").as("k"),
        col("l_partkey").as("p"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("k"), col("p")).agg(sum(col("cents")).as("cents"))
    // the pair census feeds winsTot plus two joins per MM iteration — five
    // executions of the self-join without a cut (measured 69 s at sf1);
    // truncate once under the configured durability tier (9 s)
    val matches = Checkpoints.truncate(li.as("a")
      .join(li.as("b"), expr("a.k = b.k AND a.p < b.p"))
      .select(col("a.p").as("i"), col("b.p").as("j"),
        expr("CASE WHEN a.cents > b.cents THEN 1 " +
          "WHEN a.cents < b.cents THEN 0 ELSE 1 END").as("win_i"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_ij"), sum(col("win_i")).as("wins_i")))
    val winsTot = matches.select(col("i").as("p"), col("wins_i").as("w"))
      .unionAll(matches.select(col("j").as("p"),
        (col("n_ij") - col("wins_i")).as("w")))
      .groupBy(col("p")).agg(sum(col("w")).as("wins"),
        count(lit(1)).as("n_opp"))
    var strength = winsTot.select(col("p"), lit(1000000L).as("w_e6"))
    (1 to 2).foreach { _ =>
      val terms = matches
        .join(strength.select(col("p").as("i"), col("w_e6").as("wi")), Seq("i"))
        .join(strength.select(col("p").as("j"), col("w_e6").as("wj")), Seq("j"))
        .select(col("i"), col("j"), col("n_ij"),
          expr("(n_ij * 1000000000000) div (wi + wj)").as("t_e6"))
      val denom = terms.select(col("i").as("p"), col("t_e6"))
        .unionAll(terms.select(col("j").as("p"), col("t_e6")))
        .groupBy(col("p")).agg(sum(col("t_e6")).as("d_e6"))
      strength = winsTot.join(denom, Seq("p"))
        .select(col("p"),
          expr("CASE WHEN d_e6 = 0 THEN 1000000 " +
            "ELSE (wins * 1000000000000) div d_e6 END").as("w_e6"))
    }
    winsTot.join(strength, Seq("p"))
      .select(col("p"), col("wins"), col("n_opp"), col("w_e6"))
      .orderBy(col("w_e6").desc, col("p"))
      .limit(20)
  }

  /** Simpson's-paradox audit — does the pooled association between deep
    * discounting and returns REVERSE inside any brand? (The
    * aggregation-trust check every dashboard rollup needs;
    * [[qReaggAudit]] checks additive re-aggregation, this checks
    * directional.) x = discount ≥ 5 %, y = returned; per-brand and pooled
    * risk differences `P(y|x) − P(y|¬x)` are exact ppm integers from one
    * map-side census over the bounded brand grid; `reversed` flags a
    * strict sign flip vs the pooled direction. */
  def qSimpsonReversal(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        expr("CAST(l_discount >= 0.05 AS BIGINT)").as("x"),
        expr("CAST(l_returnflag = 'R' AS BIGINT)").as("y"))
    val byBrand = cells.groupBy(col("brand"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("nx"),
        sum(expr("x * y")).as("nxy"),
        sum(expr("(1 - x) * y")).as("nny"))
    val dppm = (nxy: String, nx: String, nny: String, n: String) =>
      s"CASE WHEN $nx = 0 OR $n - $nx = 0 THEN CAST(0 AS BIGINT) ELSE " +
        s"CAST(${ppmDiv(nxy, nx)} AS BIGINT) - " +
        s"CAST(${ppmDiv(nny, s"($n - $nx)")} AS BIGINT) END"
    val pooled = byBrand.agg(sum(col("n")).as("pn"), sum(col("nx")).as("pnx"),
        sum(col("nxy")).as("pnxy"), sum(col("nny")).as("pnny"))
      .select(expr(dppm("pnxy", "pnx", "pnny", "pn")).as("pooled_d_ppm"))
    byBrand.crossJoin(broadcast(pooled))
      .select(col("brand"), col("n"),
        expr(dppm("nxy", "nx", "nny", "n")).as("d_ppm"), col("pooled_d_ppm"))
      .withColumn("reversed",
        expr("CAST(d_ppm * pooled_d_ppm < 0 AS BIGINT)"))
      .transform(ps(col("brand")))
  }

  /** 5-fold cross-validated OLS — [[qOlsClosed]] made honest about
    * generalization, in TWO passes total: pass 1 is the same nine-sum
    * census GROUPED by Knuth-hash fold (5 rows); each fold's TRAIN model
    * solves on the pooled-minus-fold sums (the jackknife complement — no
    * per-fold rescan), pass 2 scores every row against its fold's
    * out-of-fold betas (5-row broadcast) and censuses the e0-snapped
    * squared residuals. Out-of-fold R² per fold from exact integers
    * through shared double expressions. This is the distributed-CV
    * shape: fold models from ONE census, evaluation in ONE scan. */
  def qCrossvalOls(s: SparkSession, d: String): DataFrame = {
    val foldExpr = "(((l_orderkey * 10 + l_linenumber) % 2147483648) " +
      "* 2654435761) % 4294967296 % 5"
    val cells = Tables.lineitem(s, d).select(
      expr(foldExpr).as("fold"),
      expr("CAST(l_quantity AS BIGINT)").as("x1"),
      expr("CAST(round(l_discount * 100, 0) AS BIGINT)").as("x2"),
      expr("CAST(round(l_extendedprice, 0) AS BIGINT)").as("y"))
    val byFold = cells.groupBy(col("fold"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
        sum(expr("x1 * x1")).as("s11"), sum(expr("x1 * x2")).as("s12"),
        sum(expr("x2 * x2")).as("s22"), sum(expr("x1 * y")).as("s1y"),
        sum(expr("x2 * y")).as("s2y"), sum(expr("y * y")).as("syy"))
    val pooled = byFold.agg(sum(col("n")).as("pn"), sum(col("s1")).as("p1"),
      sum(col("s2")).as("p2"), sum(col("sy")).as("py"),
      sum(col("s11")).as("p11"), sum(col("s12")).as("p12"),
      sum(col("s22")).as("p22"), sum(col("s1y")).as("p1y"),
      sum(col("s2y")).as("p2y"))
    val dec = "CAST(%s AS DECIMAL(38,0))"
    def cm(a: String, b: String, ab: String) = // centered ×n train moment
      s"${dec.format("tn")} * ($ab) - ${dec.format(a)} * ${dec.format(b)}"
    val models = byFold.crossJoin(broadcast(pooled))
      .select(col("fold"), col("n").as("n_test"),
        col("sy").as("tsy"), col("syy").as("tsyy"),
        expr("pn - n").as("tn"), expr("p1 - s1").as("t1"),
        expr("p2 - s2").as("t2"), expr("py - sy").as("ty"),
        expr("p11 - s11").as("t11"), expr("p12 - s12").as("t12"),
        expr("p22 - s22").as("t22"), expr("p1y - s1y").as("t1y"),
        expr("p2y - s2y").as("t2y"))
      .select(col("fold"), col("n_test"), col("tsy"), col("tsyy"),
        col("tn"), col("t1"), col("t2"), col("ty"),
        expr(cm("t1", "t1", "t11")).as("a11"),
        expr(cm("t1", "t2", "t12")).as("a12"),
        expr(cm("t2", "t2", "t22")).as("a22"),
        expr(cm("t1", "ty", "t1y")).as("b1"),
        expr(cm("t2", "ty", "t2y")).as("b2"))
      .withColumn("det", expr("CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)"))
      .withColumn("beta1d", expr("(CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det"))
      .withColumn("beta2d", expr("(CAST(b2 AS DOUBLE) * CAST(a11 AS DOUBLE) " +
        "- CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det"))
      .withColumn("b0d", expr("(CAST(ty AS DOUBLE) - beta1d * CAST(t1 AS DOUBLE) " +
        "- beta2d * CAST(t2 AS DOUBLE)) / CAST(tn AS DOUBLE)"))
    val sse = cells.join(broadcast(models.select(col("fold"), col("b0d"),
        col("beta1d"), col("beta2d"))), Seq("fold"))
      .select(col("fold"), expr("CAST(round((CAST(y AS DOUBLE) - b0d " +
        "- beta1d * CAST(x1 AS DOUBLE) - beta2d * CAST(x2 AS DOUBLE)) " +
        "* (CAST(y AS DOUBLE) - b0d - beta1d * CAST(x1 AS DOUBLE) " +
        "- beta2d * CAST(x2 AS DOUBLE)), 0) AS BIGINT)").as("r2t"))
      .groupBy(col("fold")).agg(sum(col("r2t")).as("sse"))
    models.join(sse, Seq("fold"))
      .select(col("fold"), col("n_test"),
        expr("CAST(round(beta1d * 1000000, 0) AS BIGINT)").as("beta_qty_e6"),
        expr("CAST(round(beta2d * 1000000, 0) AS BIGINT)").as("beta_disc_e6"),
        expr("CAST(round((1.0D - CAST(sse AS DOUBLE) * CAST(n_test AS DOUBLE) " +
          "/ (CAST(n_test AS DOUBLE) * CAST(tsyy AS DOUBLE) " +
          "- CAST(tsy AS DOUBLE) * CAST(tsy AS DOUBLE))) * 1000000, 0) " +
          "AS BIGINT)").as("oof_r2_ppm"))
      .transform(ps(col("fold")))
  }

  /** Margin-based uncertainty sampling — the active-learning acquisition
    * step: score every embedding with [[qLogisticStep]]'s final (step-3)
    * weights and surface the 20 rows the model is LEAST sure about
    * (|p − ½| smallest). The e9-snapped probability makes the margin an
    * exact integer, so the top-k is a total-order TakeOrdered, not a
    * float sort; the weight frame is the same 1-row broadcast the GD
    * iterate uses. */
  def qUncertaintySample(s: SparkSession, d: String): DataFrame = {
    val w = logisticFold(s, d, 3)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        expr("CAST(embedding[0] AS DOUBLE)").as("x1"),
        expr("CAST(embedding[1] AS DOUBLE)").as("x2"))
      .crossJoin(broadcast(w.select(col("w0"), col("w1"), col("w2"))))
      .withColumn("p_e9", expr("CAST(round(1000000000 / (1.0D + " +
        "exp(-(CAST(w0 AS DOUBLE) / 1e9 + CAST(w1 AS DOUBLE) / 1e9 * x1 " +
        "+ CAST(w2 AS DOUBLE) / 1e9 * x2))), 0) AS BIGINT)"))
      .withColumn("margin_e9", expr("abs(p_e9 - 500000000)"))
      .select(col("vec_id"), col("label"), col("p_e9"), col("margin_e9"))
      .orderBy(col("margin_e9"), col("vec_id"))
      .limit(20)
  }

  /** Hierarchical (bill-of-materials style) subtree rollup over the
    * DECLARED 10-ary part forest `parent(p) = p div 10` — the
    * category-tree aggregation pattern, executed with ZERO joins: a
    * part's k-th ancestor is pure key arithmetic (`p div 10^k`, the
    * Dremel-style path encoding), so the whole rollup is one revenue
    * census exploded to its ≤ 5 ancestor levels and re-aggregated —
    * map-side combinable end to end. Subtree = self + strict descendants
    * at most 4 levels below; top-20 ancestors by subtree revenue via
    * TakeOrdered. At 100 TB this is the difference between a recursive
    * self-join per level and a fixed 5× row-local expansion. */
  def qBomRollup(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d).groupBy(col("l_partkey").as("p"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")).as("cents"))
    val levels = s.range(5).toDF("k")
    rev.crossJoin(broadcast(levels))
      .select(expr("p div CAST(pow(10, k) AS BIGINT)").as("anc"),
        col("k"), col("cents"))
      .where(col("anc") > 0L)
      .groupBy(col("anc"))
      .agg(count(lit(1)).as("n_contrib"), sum(col("cents")).as("subtree_cents"),
        max(col("k")).as("max_depth"))
      .orderBy(col("subtree_cents").desc, col("anc"))
      .limit(20)
  }

  /** Permutation test for the arm contrast — inference without a
    * distributional assumption ([[qAbtestChi2]] assumes χ²;
    * [[qBootstrapCi]] resamples WITHIN arms; this re-randomizes the
    * assignment itself): 64 deterministic pseudo-permutations flip each
    * user's arm by a Knuth hash of (user, rep), the observed and all 64
    * null mean contrasts are exact e6 integers (round-half-up over exact
    * e3 user masses), and the add-one p-value counts null contrasts at
    * least as extreme. The 64× expansion is row-local and combines
    * map-side to 65 cells — the [[qBootstrapCi]] exchange shape. */
  def qPermutationTest(s: SparkSession, d: String): DataFrame = {
    val user = Tables.events(s, d).select(col("user_id"),
        expr("CAST(round(value * 1000, 0) AS BIGINT)").as("v"))
      .groupBy(col("user_id")).agg(sum(col("v")).as("m"))
    val reps = s.range(64).toDF("rep")
    val assigned = user.crossJoin(broadcast(reps))
      .select(col("rep"), col("m"),
        expr("(((user_id * 131 + rep * 2654435761 + 17) % 2147483648) " +
          "* 2654435761) % 4294967296 % 2").as("g"))
    val nulls = assigned.groupBy(col("rep"))
      .agg(count(lit(1)).as("n"), sum(expr("g")).as("n1"),
        sum(expr("CASE WHEN g = 1 THEN m ELSE CAST(0 AS BIGINT) END")).as("s1"),
        sum(expr("CASE WHEN g = 0 THEN m ELSE CAST(0 AS BIGINT) END")).as("s0"))
      .select(col("rep"),
        expr("CASE WHEN n1 = 0 OR n - n1 = 0 THEN CAST(0 AS BIGINT) ELSE " +
          s"CAST(${roundDiv("s1", "n1", 1000L)} AS BIGINT) - " +
          s"CAST(${roundDiv("s0", "(n - n1)", 1000L)} AS BIGINT) END").as("d_e6"))
    val obs = user.select((col("user_id") % 2).as("g"), col("m"))
      .groupBy().agg(count(lit(1)).as("n"), sum(expr("g")).as("n1"),
        sum(expr("CASE WHEN g = 1 THEN m ELSE CAST(0 AS BIGINT) END")).as("s1"),
        sum(expr("CASE WHEN g = 0 THEN m ELSE CAST(0 AS BIGINT) END")).as("s0"))
      .select(expr(s"CAST(${roundDiv("s1", "n1", 1000L)} AS BIGINT) - " +
        s"CAST(${roundDiv("s0", "(n - n1)", 1000L)} AS BIGINT)").as("obs_d_e6"))
    nulls.crossJoin(broadcast(obs))
      .agg(first(col("obs_d_e6")).as("obs_d_e6"),
        count(lit(1)).as("n_reps"),
        sum(expr("CAST(abs(d_e6) >= abs(obs_d_e6) AS BIGINT)")).as("n_extreme"))
      .select(col("obs_d_e6"), col("n_reps"), col("n_extreme"),
        expr(s"CAST(${ppmDiv("(n_extreme + 1)", "(n_reps + 1)")} AS BIGINT)")
          .as("p_ppm"))
  }

  private[graft] val PrCap = 8

  /** PageRank ITERATED with per-round convergence telemetry
    * ([[qPagerankStep]] is the single superstep this loops; the loop
    * discipline is [[qKcore]]'s): damping 0.85, rank in exact ppm,
    * update `r' = 150000 + (85·Σ(r div deg)) div 100` over the
    * ≥2-co-ordered part graph, [[PrCap]] = 8 declared rounds. The trace
    * row per round carries `max |Δr|` — on the harness graphs it shows
    * the textbook geometric 0.85-decay (1.29e6 → 85 ppm at sf0.001)
    * WITHOUT reaching the exact integer fixpoint inside the cap, which
    * is the honest answer; because the dynamics are pure integer
    * functions of the previous vector, the early-exit path (`max|Δr| =
    * 0`, after which every round is provably identical and the trace
    * pads) is exact whenever it does engage, never an epsilon call.
    * Execution discipline: the symmetric edge+degree frame is
    * checkpoint-cut ONCE, each round is one edge-keyed join + map-side
    * contribution census, per-round stats ride a fused `observe` on the
    * same materialization (one job per round), and every round's lineage
    * truncates under the configured durability tier. */
  def qPagerankIter(s: SparkSession, d: String): DataFrame =
    pagerankTrace(s, d)._1

  /** The PageRank loop; returns (trace, rounds executed) so the spec can
    * pin early termination. */
  private[graft] def pagerankTrace(s: SparkSession, d: String): (DataFrame, Int) = {
    import s.implicits._
    val (e0, deg0) = coPurchaseGraph(s, d)
    if (e0.isEmpty) {
      val rows = (1 to PrCap).map(i => (i.toLong, 0L, 0L, 0L, 1L))
      return (rows.toDF("round", "n_nodes", "sum_rank_ppm", "max_delta_ppm",
        "converged"), 0)
    }
    val symDeg = Checkpoints.truncate(
      e0.select(col("pa").as("src"), col("pb").as("dst"))
        .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst")))
        .join(deg0.withColumnRenamed("n", "src"), Seq("src")))
    var ranks = Checkpoints.truncate(
      deg0.select(col("n"), lit(1000000L).as("r")))
    var trace = Vector.empty[(Long, Long, Long, Long, Long)]
    var rounds = 0
    var converged = false
    while (!converged && rounds < PrCap) {
      val obs = org.apache.spark.sql.Observation()
      val next = symDeg
        .join(ranks.withColumnRenamed("n", "src"), Seq("src"))
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("n"),
          (lit(150000L) + expr("(85 * sc) div 100")).as("r"))
        .join(ranks.select(col("n"), col("r").as("r_prev")), Seq("n"))
        .observe(obs,
          max(abs(col("r") - col("r_prev"))).as("md"),
          sum(col("r")).as("sr"), count(lit(1)).as("nn"))
        .select(col("n"), col("r"))
        .transform(Checkpoints.truncate)
      val m = obs.get
      val md = m("md").asInstanceOf[Long]
      val sr = m("sr").asInstanceOf[Long]
      val nn = m("nn").asInstanceOf[Long]
      converged = md == 0L
      rounds += 1
      trace :+= ((rounds.toLong, nn, sr, md, if (converged) 1L else 0L))
      ranks.unpersist()
      ranks = next
    }
    ranks.unpersist()
    val tail = trace.last
    val full = trace ++ (rounds + 1 to PrCap)
      .map(i => (i.toLong, tail._2, tail._3, 0L, 1L))
    (full.toDF("round", "n_nodes", "sum_rank_ppm", "max_delta_ppm",
      "converged"), rounds)
  }

  /** Modularity of the brand partition on the co-purchase graph — the
    * community-QUALITY readout that scores what [[qLabelProp]] proposes:
    * `Q = Σ_c (e_c/m − (a_c/2m)²)` decomposed per community, every term
    * an exact integer ratio (the squared degree-mass term in
    * DECIMAL(38,0)/HUGEINT — it passes 2⁶³ at fleet scale). One edge
    * census with the bounded brand dim broadcast onto both endpoints,
    * one degree census — bounded |brands| output. */
  def qGraphModularity(s: SparkSession, d: String): DataFrame = {
    val (e, deg) = coPurchaseGraph(s, d)
    val brand = broadcast(Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand")))
    val labeled = e
      .join(brand.select(col("p_partkey").as("pa"), col("p_brand").as("ba")), Seq("pa"))
      .join(brand.select(col("p_partkey").as("pb"), col("p_brand").as("bb")), Seq("pb"))
    val m = e.agg(count(lit(1)).as("m"))
    val eIn = labeled.where(col("ba") === col("bb"))
      .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("e_in"))
    val aC = deg
      .join(brand.select(col("p_partkey").as("n"), col("p_brand").as("brand")), Seq("n"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("a_c"))
    aC.join(eIn, Seq("brand"), "left")
      .crossJoin(broadcast(m))
      .select(col("brand"), col("n_nodes"), col("a_c"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("m"),
        expr("CAST((coalesce(e_in, CAST(0 AS BIGINT)) * 1000000) div m AS BIGINT) " +
          "- CAST((CAST(a_c AS DECIMAL(38,0)) * CAST(a_c AS DECIMAL(38,0)) " +
          "* 1000000) div (4 * CAST(m AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("q_contrib_ppm"))
      .drop("m")
      .transform(ps(col("brand")))
  }

  /** Degree assortativity of the co-purchase graph — do hub parts link
    * to hubs? Pearson correlation of endpoint degrees over the
    * symmetric edge list (each direction counted, the standard Newman
    * formulation): two item-keyed degree joins onto the edge stream,
    * exact centered sums in DECIMAL(38,0)/HUGEINT, presented through
    * the shared `num / sqrt(d1·d2)` double. One row. */
  def qAssortativity(s: SparkSession, d: String): DataFrame = {
    val (e, deg) = coPurchaseGraph(s, d)
    val sym = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
    val dec = "CAST(%s AS DECIMAL(38,0))"
    sym
      .join(deg.select(col("n").as("src"), col("d").as("x")), Seq("src"))
      .join(deg.select(col("n").as("dst"), col("d").as("y")), Seq("dst"))
      .agg(count(lit(1)).as("m2"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr(s"${dec.format("x")} * ${dec.format("x")}")).as("sxx"),
        sum(expr(s"${dec.format("y")} * ${dec.format("y")}")).as("syy"),
        sum(expr(s"${dec.format("x")} * ${dec.format("y")}")).as("sxy"))
      .select(col("m2"),
        expr(s"${dec.format("m2")} * sxy - ${dec.format("sx")} * ${dec.format("sy")}").as("num"),
        expr(s"${dec.format("m2")} * sxx - ${dec.format("sx")} * ${dec.format("sx")}").as("d1"),
        expr(s"${dec.format("m2")} * syy - ${dec.format("sy")} * ${dec.format("sy")}").as("d2"))
      .select(col("m2").as("m_directed_edges"),
        expr("CASE WHEN d1 = 0 OR d2 = 0 THEN 0 ELSE " +
          "CAST(round(CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE) " +
          "* CAST(d2 AS DOUBLE)) * 1000000, 0) AS BIGINT) END").as("r_e6"))
  }

  /** Wilcoxon-Mann-Whitney rank-sum test — the nonparametric two-sample
    * location test beside [[qKsDrift]]'s distribution distance and
    * [[qAbtestChi2]]'s categorical test: order-total cents by arm
    * (orderkey parity). Exact path: one distinct-value census (n₀, n₁
    * per cent value), the scalable two-phase prefix sum supplies each
    * value's rank-before count (never a single-task window over the
    * value frame), tie-averaged ranks carried ×2 so everything stays
    * integer (`2·avgrank = 2·before + t + 1`), and the tie-corrected
    * normal approximation presents z through shared double expressions
    * from DECIMAL(38,0)/HUGEINT moments (`Σ(t³−t)` passes 2⁶³ under
    * heavy ties at fleet scale). One row. */
  def qMannWhitney(s: SparkSession, d: String): DataFrame = {
    val vals = Tables.orders(s, d).select(
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("v"),
      (col("o_orderkey") % 2).as("arm"))
    val census = vals.groupBy(col("v"))
      .agg(count(lit(1)).as("t"), sum(col("arm")).as("n1v"))
    val ranked = Ops.prefixSumScalable(census, "v", "t", "before")
    val dec = "CAST(%s AS DECIMAL(38,0))"
    ranked
      .agg(sum(col("t") - col("n1v")).as("n0"), sum(col("n1v")).as("n1"),
        sum(expr("n1v * (2 * before + t + 1)")).as("r1_x2"),
        sum(expr(s"(${dec.format("t")} * ${dec.format("t")} * ${dec.format("t")}) - ${dec.format("t")}"))
          .as("tie3"))
      .select(col("n0"), col("n1"),
        expr("r1_x2 - n1 * (n1 + 1)").as("u1_x2"), col("tie3"),
        expr(s"${dec.format("n0")} + ${dec.format("n1")}").as("nn"))
      .select(col("n0"), col("n1"), col("u1_x2"),
        expr("CASE WHEN n0 = 0 OR n1 = 0 THEN 0 ELSE CAST(round(" +
          "(CAST(u1_x2 AS DOUBLE) / 2.0D - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0D) " +
          "/ sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0D " +
          "* ((CAST(nn AS DOUBLE) + 1.0D) - CAST(tie3 AS DOUBLE) " +
          "/ (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0D)))) " +
          "* 1000000, 0) AS BIGINT) END").as("z_e6"))
  }

  /** Directed association rules with confidence and conviction — the
    * rule-emission step past [[qPartAffinity]]'s symmetric lift and
    * [[qFrequentTriples]]' itemsets: each frequent pair yields both
    * directions, `conf(i→j) = n_ij/n_i` exact ppm and
    * `conviction(i→j) = n_i·(N − n_j) / (N·(n_i − n_ij))` exact e6 in
    * DECIMAL(38,0)/HUGEINT (∞ when conf = 1 → sentinel 999999999).
    * Basket-bounded pair census + broadcast item counts; top-20 rules by
    * (confidence, support) — no absolute confidence floor, because random
    * baskets dilute item supports as the corpus grows and a fixed floor
    * would empty the readout at scale. */
  def qRuleConfidence(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val nOrders = op.select(col("k")).distinct().agg(count(lit(1)).as("nn"))
    val item = op.groupBy(col("p")).agg(count(lit(1)).as("np"))
    val pair = op.as("a").join(op.as("b"), expr("a.k = b.k AND a.p < b.p"))
      .groupBy(col("a.p").as("i"), col("b.p").as("j"))
      .agg(count(lit(1)).as("n_ij"))
      .where(col("n_ij") >= 5L)
    val rules = pair.select(col("i"), col("j"), col("n_ij"))
      .unionAll(pair.select(col("j").as("i"), col("i").as("j"), col("n_ij")))
    rules
      .join(broadcast(item.select(col("p").as("i"), col("np").as("n_i"))), Seq("i"))
      .join(broadcast(item.select(col("p").as("j"), col("np").as("n_j"))), Seq("j"))
      .crossJoin(broadcast(nOrders))
      .select(col("i"), col("j"), col("n_ij"), col("n_i"), col("n_j"),
        expr(s"CAST(${ppmDiv("n_ij", "n_i")} AS BIGINT)").as("conf_ppm"),
        expr("CASE WHEN n_i = n_ij THEN CAST(999999999 AS BIGINT) ELSE " +
          "CAST((CAST(n_i AS DECIMAL(38,0)) * (CAST(nn AS DECIMAL(38,0)) " +
          "- CAST(n_j AS DECIMAL(38,0))) * 1000000) div " +
          "(CAST(nn AS DECIMAL(38,0)) * (CAST(n_i AS DECIMAL(38,0)) " +
          "- CAST(n_ij AS DECIMAL(38,0)))) AS BIGINT) END").as("conviction_e6"))
      .orderBy(col("conf_ppm").desc, col("n_ij").desc, col("i"), col("j"))
      .limit(20)
  }

  /** Benjamini-Hochberg FDR control over per-brand permutation p-values —
    * the multiple-testing discipline a 25-brand screen needs before
    * acting on [[qSimpsonReversal]]-style per-group contrasts, EXACT end
    * to end: per brand, the observed return-rate arm contrast and 64
    * Knuth-hash null contrasts give an add-one permutation p = e/65 with
    * integer numerator e; the BH step-up `p_(k) ≤ k·α/m` (α = 0.1)
    * cross-multiplies to `e·10·m ≤ k·65` with m COUNTED from the ranked
    * brand frame — not hardcoded, so the realized FDR level adapts if the
    * brand universe ever differs from TPC-H's 25. No float ever decides
    * a rejection. One 64×-expanded map-side census to |brands|·65 cells;
    * the step-up runs on the bounded brand frame. */
  def qFdrBh(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_orderkey").as("k"),
        expr("CAST(l_returnflag = 'R' AS BIGINT)").as("y"))
    val reps = s.range(64).toDF("rep")
    def contrast(df: DataFrame, garm: String): DataFrame = df
      .groupBy(df.columns.filter(c => c != "k" && c != "y").map(col): _*)
      .agg(count(lit(1)).as("n"), sum(expr(garm)).as("n1"),
        sum(expr(s"($garm) * y")).as("s1"),
        sum(expr(s"(1 - ($garm)) * y")).as("s0"))
      .withColumn("d_ppm", expr("CASE WHEN n1 = 0 OR n - n1 = 0 THEN " +
        s"CAST(0 AS BIGINT) ELSE CAST(${ppmDiv("s1", "n1")} AS BIGINT) - " +
        s"CAST(${ppmDiv("s0", "(n - n1)")} AS BIGINT) END"))
    val obs = contrast(cells, "k % 2")
      .select(col("brand"), col("d_ppm").as("obs_d_ppm"))
    val nulls = contrast(cells.crossJoin(broadcast(reps)),
        "(((k * 131 + rep * 2654435761 + 17) % 2147483648) * 2654435761) " +
          "% 4294967296 % 2")
      .select(col("brand"), col("d_ppm"))
    val e = nulls.join(broadcast(obs), Seq("brand"))
      .groupBy(col("brand"))
      .agg(first(col("obs_d_ppm")).as("obs_d_ppm"),
        (sum(expr("CAST(abs(d_ppm) >= abs(obs_d_ppm) AS BIGINT)")) + 1L).as("e"))
    val ranked = e.withColumn("rank",
      row_number().over(Window.orderBy(col("e"), col("brand"))).cast("bigint"))
    val m = ranked.agg(count(lit(1)).as("m"))
    val kmax = ranked.crossJoin(broadcast(m)).agg(coalesce(max(when(
      col("e") * 10L * col("m") <= col("rank") * 65L, col("rank"))), lit(0L)).as("kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col("brand"), col("obs_d_ppm"), col("e"),
        expr(s"CAST(${ppmDiv("e", "65")} AS BIGINT)").as("p_ppm"),
        col("rank"),
        (col("rank") <= col("kmax")).cast("bigint").as("rejected"))
      .transform(ps(col("brand")))
  }

  /** Power analysis for the next experiment — the design-of-experiments
    * readout that closes the loop the [[qAbtestChi2]]/[[qCuped]]/
    * [[qSprt]] tier opens: per-arm sample size to detect a 2 % relative
    * lift of the event-value mean at α = 0.05, power 0.80,
    * `n = (z_{α/2}+z_β)²·2σ²/δ²` with the z-sum HARDCODED e9
    * (1.959963985 + 0.841621234 — no cross-engine quantile function).
    * Pooled variance from one exact e3-snapped census; the final n and
    * the achieved-power-at-current-n inputs present through shared
    * double expressions. One row. */
  def qPowerAnalysis(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .select(expr("CAST(round(value * 1000, 0) AS BIGINT)").as("v"))
    val dec = "CAST(%s AS DECIMAL(38,0))"
    cells.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(expr(s"${dec.format("v")} * ${dec.format("v")}")).as("svv"))
      .select(col("n"), col("sv"),
        expr(s"${dec.format("n")} * svv - ${dec.format("sv")} * ${dec.format("sv")}").as("cvv"))
      .select(col("n"),
        // σ² and δ = 0.02·mean, both in e3 units, exact inputs → doubles
        expr("CAST(round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 0) AS BIGINT)")
          .as("mean_e3"),
        expr("CAST(round(CAST(cvv AS DOUBLE) / (CAST(n AS DOUBLE) " +
          "* CAST(n AS DOUBLE)), 0) AS BIGINT)").as("var_e6"),
        expr("CAST(round(2.801585219 * 2.801585219 * 2.0D " +
          "* (CAST(cvv AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) " +
          "/ ((0.02D * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "* (0.02D * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))), 0) AS BIGINT)")
          .as("n_per_arm"))
  }

  /** Effective sample size of the length-proportional importance weights
    * per source — the resampling-health check a [[qDsirWeights]]-style
    * reweighting needs before training on it: `ESS = (Σw)²/Σw²` with
    * w = n_chars (exact longs; squares in DECIMAL(38,0)/HUGEINT),
    * reported as exact-ppm efficiency `ESS/n` per source and pooled.
    * One |sources|-row census — a weight distribution whose efficiency
    * collapses says the reweighting is a subsample in disguise. */
  def qEssWeights(s: SparkSession, d: String): DataFrame = {
    val dec = "CAST(%s AS DECIMAL(38,0))"
    val bySrc = Tables.documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sw"),
        sum(expr(s"${dec.format("n_chars")} * ${dec.format("n_chars")}")).as("sww"))
    val pooled = bySrc.agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sw")).as("sw"), sum(col("sww")).as("sww"))
      .select(lit("__all__").as("source"), col("n_docs"), col("sw"), col("sww"))
    bySrc.unionByName(pooled)
      .select(col("source"), col("n_docs"),
        expr("CAST(round(CAST(CAST(sw AS DECIMAL(38,0)) " +
          "* CAST(sw AS DECIMAL(38,0)) AS DOUBLE) / CAST(sww AS DOUBLE), 0) " +
          "AS BIGINT)").as("ess"),
        expr("CAST(round(CAST(CAST(sw AS DECIMAL(38,0)) " +
          "* CAST(sw AS DECIMAL(38,0)) AS DOUBLE) / CAST(sww AS DOUBLE) " +
          "/ CAST(n_docs AS DOUBLE) * 1000000, 0) AS BIGINT)").as("efficiency_ppm"))
      .transform(ps(col("source")))
  }

  /** Stratified treatment-effect estimate — the observational-causal
    * adjustment tier ([[qAbtestChi2]] assumes randomization; this
    * adjusts for a confounder when there wasn't any): treatment = the
    * order was expedited (priority 1-2), outcome = any line returned,
    * strata = declared account-balance bands of the ordering customer
    * (`floor(bal) div 2000` — banding identical in both engines by the
    * shared truncate-toward-zero division). Per-stratum risk differences
    * and the n-weighted pooled ATE are exact ppm integers. One order
    * census (per-order outcome flag), one customer equi-join, one
    * bounded strata frame. */
  def qPropensityStrata(s: SparkSession, d: String): DataFrame = {
    val outcome = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(max(expr("CAST(l_returnflag = 'R' AS BIGINT)")).as("y"))
    val cells = Tables.orders(s, d)
      .join(outcome, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d).select(col("c_custkey"),
        expr("CAST(floor(c_acctbal) AS BIGINT) div 2000").as("stratum")),
        col("o_custkey") === col("c_custkey"))
      .select(col("stratum"),
        expr("CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT)").as("t"),
        col("y"))
    val byStratum = cells.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("nt"),
        sum(expr("t * y")).as("nty"), sum(expr("(1 - t) * y")).as("ncy"))
      .withColumn("d_ppm", expr("CASE WHEN nt = 0 OR n - nt = 0 THEN " +
        s"CAST(0 AS BIGINT) ELSE CAST(${ppmDiv("nty", "nt")} AS BIGINT) - " +
        s"CAST(${ppmDiv("ncy", "(n - nt)")} AS BIGINT) END"))
    val pooled = byStratum
      .agg(sum(col("n")).as("nn"), sum(expr("n * d_ppm")).as("wd"))
      .select(expr("CAST(wd div nn AS BIGINT)").as("ate_ppm"))
    byStratum.crossJoin(broadcast(pooled))
      .select(col("stratum"), col("n"), col("nt"), col("d_ppm"), col("ate_ppm"))
      .transform(ps(col("stratum")))
  }

  /** Kneser-Ney smoothed bigram model — the LM-smoothing tier past
    * [[qBigramPpx]]'s MLE surprisal and [[qLmPerplexity]]'s add-one:
    * absolute discount d = 3/4 (an exact rational, so the whole
    * probability is the exact integer ratio
    * `[(4c12-3)·T + 3·N1+(w1·)·N1+(·w2)] / (4·c1·T)` — no float ever
    * enters), with continuation counts `N1+` from the same bigram
    * census. Shapes at 100 TB: token-keyed map-side censuses only
    * (bigram counts, left/right continuation counts, one scalar T);
    * readout is TakeOrdered top-20 by bigram frequency. */
  def qKnSmooth(s: SparkSession, d: String): DataFrame = {
    val bigrams = Tables.documents(s, d)
      .select(split(lower(Ops.normalizeWs(col("text"))), " ").as("toks"))
      .select(posexplode(col("toks")).as(Seq("pos", "w1")), col("toks"))
      .where(col("pos") < size(col("toks")) - 1)
      .select(col("w1"), expr("toks[pos + 1]").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"),
      count(lit(1)).as("n1fw"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("ncont"))
    val tTypes = c12.agg(count(lit(1)).as("tt"))
    c12.join(c1, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(tTypes))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        expr(s"CAST(${ppmDiv(
          "((4 * c12 - 3) * tt + 3 * n1fw * ncont)", "(4 * c1 * tt)")} AS BIGINT)")
          .as("p_kn_ppm"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Wilson score interval for each arm's purchase rate — the interval
    * tier the point-estimate A/B readouts lack (a CI communicates what
    * [[qAbtestChi2]]'s p-value cannot): `z = 1.959963985` HARDCODED (no
    * cross-engine quantile), bounds presented through shared double
    * expressions from the exact per-arm (n, k) census. Wilson, not Wald,
    * because it never exits [0,1] and behaves at small k — the interval
    * a rate dashboard should ship. Two rows from one census. */
  def qWilsonCi(s: SparkSession, d: String): DataFrame = {
    val z = "1.959963985D"
    Tables.events(s, d)
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(event_type = 'purchase' AS BIGINT)")).as("k"))
      .select(col("arm"), col("n"), col("k"),
        expr(s"CAST(round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) " +
          s"+ $z * $z / (2.0D * CAST(n AS DOUBLE)) - $z * sqrt(" +
          s"CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * (1.0D - CAST(k AS DOUBLE) " +
          s"/ CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + $z * $z / (4.0D " +
          s"* CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / (1.0D + $z * $z " +
          s"/ CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)").as("lo_ppm"),
        expr(s"CAST(round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) " +
          s"+ $z * $z / (2.0D * CAST(n AS DOUBLE)) + $z * sqrt(" +
          s"CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * (1.0D - CAST(k AS DOUBLE) " +
          s"/ CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + $z * $z / (4.0D " +
          s"* CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / (1.0D + $z * $z " +
          s"/ CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)").as("hi_ppm"))
      .transform(ps(col("arm")))
  }

  /** Cohen's kappa between a thresholded model signal and the gold label
    * — chance-corrected agreement, the metric [[qAucPerClass]]'s ranking
    * view and [[qBrierCalibration]]'s probability view both miss: rater
    * A = first embedding dim positive, rater B = label < 5. The whole
    * statistic is ONE exact integer ratio
    * `κ = (n·agree − (a₁b₁ + a₀b₀)) / (n² − (a₁b₁ + a₀b₀))` from a
    * single map-side census, presented e6 through one shared double
    * division (numerator may be negative — κ < 0 means worse than
    * chance). The census products run in DECIMAL(38,0) like the sibling
    * moment queries — n·n passes 2⁶³ at ~3.04e9 rows, where BIGINT would
    * wrap silently in non-ANSI Spark while DuckDB errors. One row. */
  def qCohensKappa(s: SparkSession, d: String): DataFrame = {
    val dec = "CAST(%s AS DECIMAL(38,0))"
    Tables.embeddings(s, d)
      .select(expr("CAST(embedding[0] > CAST(0.0 AS FLOAT) AS BIGINT)").as("a"),
        expr("CAST(label < 5 AS BIGINT)").as("b"))
      .agg(count(lit(1)).as("n"), sum(col("a")).as("a1"), sum(col("b")).as("b1"),
        sum(expr("CAST(a = b AS BIGINT)")).as("agree"))
      .select(col("n"), col("a1"), col("b1"), col("agree"),
        expr(s"CAST(round(CAST(${dec.format("n")} * agree - " +
          s"(${dec.format("a1")} * b1 + ${dec.format("(n - a1)")} * (n - b1)) " +
          s"AS DOUBLE) / CAST(${dec.format("n")} * n - " +
          s"(${dec.format("a1")} * b1 + ${dec.format("(n - a1)")} * (n - b1)) " +
          "AS DOUBLE) * 1000000, 0) AS BIGINT)").as("kappa_e6"))
  }

  /** Kendall tau-b between the revenue ranking and the volume ranking of
    * the top-20 revenue parts — rank correlation, the ordinal
    * association tier ([[qRollingCorr]] is Pearson on values,
    * [[qTopkChurn]] is set overlap; neither asks "do the two metrics
    * ORDER the catalog the same way?"). The corpus pass is one
    * TakeOrdered top-20; concordance counting is the 190-pair
    * self-join of that bounded broadcast frame in exact integers (ties
    * handled by the tau-b correction), with tau presented through the
    * shared `.. / sqrt(d1·d2)` double. One row. */
  def qKendallTau(s: SparkSession, d: String): DataFrame = {
    val top = Tables.lineitem(s, d).groupBy(col("l_partkey").as("p"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")).as("rev"),
        sum(expr("CAST(l_quantity AS BIGINT)")).as("qty"))
      .orderBy(col("rev").desc, col("p"))
      .limit(20)
    val pairs = broadcast(top.as("a"))
      .join(broadcast(top.as("b")), expr("a.p < b.p"))
      .select(
        expr("CAST(sign(a.rev - b.rev) AS BIGINT)").as("sx"),
        expr("CAST(sign(a.qty - b.qty) AS BIGINT)").as("sy"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(sx * sy > 0 AS BIGINT)")).as("nc"),
        sum(expr("CAST(sx * sy < 0 AS BIGINT)")).as("nd"),
        sum(expr("CAST(sx = 0 AS BIGINT)")).as("tx"),
        sum(expr("CAST(sy = 0 AS BIGINT)")).as("ty"))
      .select(col("n_pairs"), col("nc"), col("nd"),
        expr("CASE WHEN n_pairs = tx OR n_pairs = ty THEN 0 ELSE " +
          "CAST(round(CAST(nc - nd AS DOUBLE) / sqrt(CAST(n_pairs - tx AS DOUBLE) " +
          "* CAST(n_pairs - ty AS DOUBLE)) * 1000000, 0) AS BIGINT) END")
          .as("tau_e6"))
  }

  /** Simplified (centroid-based) silhouette per k-means cluster — the
    * geometric cluster-quality readout beside [[qClusterPurity]]'s
    * label-based view: with argmin assignment, a = distance to own
    * centroid is the row's smallest centroid distance and b = the
    * second-smallest, so `s = 1 − d₁/d₂`. Every squared per-element
    * deviation snaps to e9 BEFORE summing, making each centroid distance
    * an exact long and s an exact ppm ratio — no float ever crosses the
    * engines (the full-pairwise silhouette is O(n²) by definition; the
    * centroid form is the one that scales, one broadcast-expression scan).
    * Same deterministic k = 8 seed centroids as [[qKmeansStep]]. */
  def qSilhouette(s: SparkSession, d: String): DataFrame = {
    val cents = cachedSeedCentroids(s, d, 8)
    val vecD = col("embedding").cast("array<double>")
    def dist2e9(c: Array[Double]): Column =
      aggregate(
        zip_with(vecD, array(c.map(lit): _*),
          (a, b) => round((a - b) * (a - b) * lit(1000000000.0), 0).cast("bigint")),
        lit(0L), (acc, x) => acc + x)
    val packed = cents.map { case (cid, c) =>
      struct(dist2e9(c).as("d"), lit(cid).as("cid"))
    }
    val sorted = array_sort(array(packed.toSeq: _*))
    Tables.embeddings(s, d)
      .select(sorted.getItem(0).getField("cid").as("cluster_id"),
        sorted.getItem(0).getField("d").as("d1"),
        sorted.getItem(1).getField("d").as("d2"))
      .select(col("cluster_id"),
        expr("CASE WHEN d2 = 0 THEN CAST(0 AS BIGINT) ELSE " +
          s"CAST(1000000 - (${ppmDiv("d1", "d2")}) AS BIGINT) END").as("s_ppm"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"), sum(col("s_ppm")).as("s_sum_ppm"))
      .select(col("cluster_id"), col("n"),
        expr(s"CAST(${roundDiv("s_sum_ppm", "n", 1L)} AS BIGINT)").as("mean_s_ppm"))
      .transform(ps(col("cluster_id")))
  }

  // ------------------------------------------------------------ registry

  val all: Map[String, Q] = Map(
    "q_scan_project" -> (qScanProject _),
    "q_filter_nonnull" -> (qFilterNonnull _),
    "q_distinct_ids" -> (qDistinctIds _),
    "q_sorted_distinct" -> (qSortedDistinct _),
    "q_dedup_first_wins" -> (qDedupFirstWins _),
    "q_dedup_pairs" -> (qDedupPairs _),
    "q_seeded_sample" -> (qSeededSample _),
    "q_batch_assign" -> (qBatchAssign _),
    "q_normalize_text" -> (qNormalizeText _),
    "q_json_extract" -> (qJsonExtract _),
    "q_bridge_table" -> (qBridgeTable _),
    "q_semi_join" -> (qSemiJoin _),
    "q_partitioned_counts" -> (qPartitionedCounts _),
    "q_entity_counts" -> (qEntityCounts _),
    "q_agg_pricing" -> (qAggPricing _),
    "q_join_agg" -> (qJoinAgg _),
    "q_window_topk" -> (qWindowTopk _),
    "q_window_running" -> (qWindowRunning _),
    "q_set_ops" -> (qSetOps _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_text_tokens" -> (qTextTokens _),
    "q_minhash_signature" -> (qMinhashSignature _),
    "q_minhash_dedup" -> (qMinhashDedup _),
    "q_setsim_join" -> (qSetsimJoin _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_doc_fingerprint" -> (qDocFingerprint _),
    "q_exact_dedup" -> (qExactDedup _),
    "q_quality_score" -> (qQualityScore _),
    "q_cosine_topk" -> (qCosineTopk _),
    "q_simhash_dedup" -> (qSimhashDedup _),
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_nearest" -> (qAsofNearest _),
    "q_rollup" -> (qRollup _),
    "q_token_count" -> (qTokenCount _),
    "q_window_range" -> (qWindowRange _),
    "q_trending" -> (qTrending _),
    "q_window_lag" -> (qWindowLag _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_monthly_revenue" -> (qMonthlyRevenue _),
    "q_batch_format" -> (qBatchFormat _),
    "q_json_struct" -> (qJsonStruct _),
    "q_cube" -> (qCube _),
    "q_range_join" -> (qRangeJoin _),
    "q_pivot" -> (qPivot _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_ann_exhaustive" -> (qAnnExhaustive _),
    "q_ann_lsh_exact" -> (qAnnLshExact _),
    "q_vector_norm" -> (qVectorNorm _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_anti_join" -> (qAntiJoin _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_sessionize" -> (qSessionize _),
    "q_closed_sessions" -> (qClosedSessions _),
    "q_lang_id" -> (qLangId _),
    "q_percentiles" -> (qPercentiles _),
    "q_argmax" -> (qArgmax _),
    "q_conditional_agg" -> (qConditionalAgg _),
    "q_stats" -> (qStats _),
    "q_string_agg" -> (qStringAgg _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_date_parse" -> (qDateParse _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_exists_subquery" -> (qExistsSubquery _),
    "q_ntile" -> (qNtile _),
    "q_first_last" -> (qFirstLast _),
    "q_unpivot" -> (qUnpivot _),
    "q_explode_outer" -> (qExplodeOuter _),
    "q_regexp_extract" -> (qRegexpExtract _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_date_arith" -> (qDateArith _),
    "q_histogram" -> (qHistogram _),
    "q_full_outer" -> (qFullOuter _),
    "q_percent_rank" -> (qPercentRank _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_scd2" -> (qScd2 _),
    "q_binary_meta" -> (qBinaryMeta _),
    "q_union_by_name" -> (qUnionByName _),
    "q_tumbling_window" -> (qTumblingWindow _),
    "q_bloom_semi_join" -> (qBloomSemiJoin _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_date_series" -> (qDateSeries _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_cdc_apply" -> (qCdcApply _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_sliding_window" -> (qSlidingWindow _),
    "q_minhash_dedup_map" -> (qMinhashDedupMap _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_repetition_score" -> (qRepetitionScore _),
    "q_tfidf" -> (qTfidf _),
    "q_vocab_build" -> (qVocabBuild _),
    "q_dataset_mixture" -> (qDatasetMixture _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_quality_filter" -> (qQualityFilter _),
    "q_ngram_counts" -> (qNgramCounts _),
    "q_kmeans_step" -> (qKmeansStep _),
    "q_vector_quantize" -> (qVectorQuantize _),
    "q_knn_join" -> (qKnnJoin _),
    "q_knn_join_blocked" -> (qKnnJoinBlocked _),
    "q_sem_dedup" -> (qSemDedup _),
    "q_minhash_est" -> (qMinhashEst _),
    "q_bm25" -> (qBm25 _),
    "q_dup_ngram_spans" -> (qDupNgramSpans _),
    "q_substring_dedup" -> (qSubstringDedup _),
    "q_funnel" -> (qFunnel _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_percentile_gate" -> (qPercentileGate _),
    "q_zscore" -> (qZscore _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_skyline" -> (qSkyline _),
    "q_chunk_windows" -> (qChunkWindows _),
    "q_train_split" -> (qTrainSplit _),
    "q_leakage_split" -> (qLeakageSplit _),
    "q_rarity_score" -> (qRarityScore _),
    "q_pmi_topk" -> (qPmiTopk _),
    "q_global_rank" -> (qGlobalRank _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_regr_trend" -> (qRegrTrend _),
    "q_next_token" -> (qNextToken _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_dedup_audit" -> (qDedupAudit _),
    "q_langid_confusion" -> (qLangidConfusion _),
    "q_cluster_sizes" -> (qClusterSizes _),
    "q_padding_waste" -> (qPaddingWaste _),
    "q_ks_drift" -> (qKsDrift _),
    "q_winsorize" -> (qWinsorize _),
    "q_source_terms" -> (qSourceTerms _),
    "q_token_gini" -> (qTokenGini _),
    "q_trigram_paths" -> (qTrigramPaths _),
    "q_stickiness" -> (qStickiness _),
    "q_rfm_cells" -> (qRfmCells _),
    "q_ship_priority" -> (qShipPriority _),
    "q_market_share" -> (qMarketShare _),
    "q_part_affinity" -> (qPartAffinity _),
    "q_small_qty_revenue" -> (qSmallQtyRevenue _),
    "q_simpson_diversity" -> (qSimpsonDiversity _),
    "q_table_checksum" -> (qTableChecksum _),
    "q_power_iteration" -> (qPowerIteration _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_changepoint" -> (qChangepoint _),
    "q_auc_per_class" -> (qAucPerClass _),
    "q_calibration_bins" -> (qCalibrationBins _),
    "q_seasonal_anomaly" -> (qSeasonalAnomaly _),
    "q_reagg_audit" -> (qReaggAudit _),
    "q_zipf_profile" -> (qZipfProfile _),
    "q_triangle_count" -> (qTriangleCount _),
    "q_ttr_profile" -> (qTtrProfile _),
    "q_top_supplier" -> (qTopSupplier _),
    "q_large_orders" -> (qLargeOrders _),
    "q_vocab_overlap" -> (qVocabOverlap _),
    "q_null_profile" -> (qNullProfile _),
    "q_lsh_precision" -> (qLshPrecision _),
    "q_user_growth" -> (qUserGrowth _),
    "q_lsh_recall" -> (qLshRecall _),
    "q_order_gaps" -> (qOrderGaps _),
    "q_dup_degree" -> (qDupDegree _),
    "q_len_profile" -> (qLenProfile _),
    "q_tvd_drift" -> (qTvdDrift _),
    "q_doc_novelty" -> (qDocNovelty _),
    "q_burstiness" -> (qBurstiness _),
    "q_equi_height" -> (qEquiHeight _),
    "q_conversion_time" -> (qConversionTime _),
    "q_window_dedup" -> (qWindowDedup _),
    "q_pareto" -> (qPareto _),
    "q_clamped_balance" -> (qClampedBalance _),
    "q_ewma_decay" -> (qEwmaDecay _),
    "q_rolling_corr" -> (qRollingCorr _),
    "q_pagerank_step" -> (qPagerankStep _),
    "q_label_prop" -> (qLabelProp _),
    "q_inverted_index" -> (qInvertedIndex _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_graph_components" -> (qGraphComponents _),
    "q_fk_audit" -> (qFkAudit _),
    "q_skew_profile" -> (qSkewProfile _),
    "q_dataset_card" -> (qDatasetCard _),
    "q_ndv_stats" -> (qNdvStats _),
    "q_bfs_levels" -> (qBfsLevels _),
    "q_abtest_chi2" -> (qAbtestChi2 _),
    "q_prefix_dup" -> (qPrefixDup _),
    "q_containment" -> (qContainment _),
    "q_mann_kendall" -> (qMannKendall _),
    "q_incremental_dedup" -> (qIncrementalDedup _),
    "q_locf_impute" -> (qLocfImpute _),
    "q_regional_revenue" -> (qRegionalRevenue _),
    "q_returned_customers" -> (qReturnedCustomers _),
    "q_promo_share" -> (qPromoShare _),
    "q_funnel_bounded" -> (qFunnelBounded _),
    "q_discovery_curve" -> (qDiscoveryCurve _),
    "q_zone_map" -> (qZoneMap _),
    "q_balanced_sample" -> (qBalancedSample _),
    "q_dedup_report" -> (qDedupReport _),
    "q_theil_sen" -> (qTheilSen _),
    "q_autocorr" -> (qAutocorr _),
    "q_runs_test" -> (qRunsTest _),
    "q_revenue_bridge" -> (qRevenueBridge _),
    "q_ab_quantiles" -> (qAbQuantiles _),
    "q_session_lengths" -> (qSessionLengths _),
    "q_rolling_median" -> (qRollingMedian _),
    "q_benford" -> (qBenford _),
    "q_cohort_ltv" -> (qCohortLtv _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_trimmed_mean" -> (qTrimmedMean _),
    "q_mode_stat" -> (qModeStat _),
    "q_iqr_outliers" -> (qIqrOutliers _),
    "q_gap_interp" -> (qGapInterp _),
    "q_order_count_dist" -> (qOrderCountDist _),
    "q_min_price_supplier" -> (qMinPriceSupplier _),
    "q_char_ngrams" -> (qCharNgrams _),
    "q_interarrival" -> (qInterarrival _),
    "q_norm_outliers" -> (qNormOutliers _),
    "q_idle_customers" -> (qIdleCustomers _),
    "q_cross_source_dup" -> (qCrossSourceDup _),
    "q_seasonality_index" -> (qSeasonalityIndex _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_burst_days" -> (qBurstDays _),
    "q_max_concurrency" -> (qMaxConcurrency _),
    "q_dedup_survivorship" -> (qDedupSurvivorship _),
    "q_growth_accounting" -> (qGrowthAccounting _),
    "q_quantile_normalize" -> (qQuantileNormalize _),
    "q_div_convention" -> (qDivConvention _),
    "q_media_summary" -> (qMediaSummary _),
    "q_forecast_revenue" -> (qForecastRevenue _),
    "q_volume_shipping" -> (qVolumeShipping _),
    "q_brand_qty_revenue" -> (qBrandQtyRevenue _),
    "q_doc_len_hist" -> (qDocLenHist _),
    "q_lang_mix" -> (qLangMix _),
    "q_interleave" -> (qInterleave _),
    "q_band_stats" -> (qBandStats _),
    "q_order_priority" -> (qOrderPriority _),
    "q_late_suppliers" -> (qLateSuppliers _),
    "q_bollinger" -> (qBollinger _),
    "q_ndcg" -> (qNdcg _),
    "q_feature_hash" -> (qFeatureHash _),
    "q_doc_entropy" -> (qDocEntropy _),
    "q_mips" -> (qMips _),
    "q_bpe_merges" -> (qBpeMerges _),
    "q_clustering_coeff" -> (qClusteringCoeff _),
    "q_frame_sample" -> (qFrameSample _),
    "q_nation_profit" -> (qNationProfit _),
    "q_part_supplier_counts" -> (qPartSupplierCounts _),
    "q_dominant_supplier" -> (qDominantSupplier _),
    "q_blocklist_filter" -> (qBlocklistFilter _),
    "q_kcore" -> (qKcore _),
    "q_attribution" -> (qAttribution _),
    "q_late_arrivals" -> (qLateArrivals _),
    "q_ann_pq" -> (qAnnPq _),
    "q_quantized_rerank" -> (qQuantizedRerank _),
    "q_bigram_ppx" -> (qBigramPpx _),
    "q_pit_join" -> (qPitJoin _),
    "q_negative_sample" -> (qNegativeSample _),
    "q_kmv_distinct" -> (qKmvDistinct _),
    "q_kmv_set_ops" -> (qKmvSetOps _),
    "q_hist_quantiles" -> (qHistQuantiles _),
    "q_cms_estimate" -> (qCmsEstimate _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_zorder_layout" -> (qZorderLayout _),
    "q_compaction_plan" -> (qCompactionPlan _),
    "q_join_size_est" -> (qJoinSizeEst _),
    "q_ams_f2" -> (qAmsF2 _),
    "q_mrr" -> (qMrr _),
    "q_rank_fusion" -> (qRankFusion _),
    "q_dsir_weights" -> (qDsirWeights _),
    "q_chi2_tokens" -> (qChi2Tokens _),
    "q_group_quantiles" -> (qGroupQuantiles _),
    "q_temperature_mix" -> (qTemperatureMix _),
    "q_dp_counts" -> (qDpCounts _),
    "q_maxsim" -> (qMaxsim _),
    "q_l_diversity" -> (qLDiversity _),
    "q_t_closeness" -> (qTCloseness _),
    "q_winnow_fingerprint" -> (qWinnowFingerprint _),
    "q_triplet_mine" -> (qTripletMine _),
    "q_preference_pairs" -> (qPreferencePairs _),
    "q_winnow_matches" -> (qWinnowMatches _),
    "q_embed_dim_stats" -> (qEmbedDimStats _),
    "q_cluster_purity" -> (qClusterPurity _),
    "q_random_projection" -> (qRandomProjection _),
    "q_kl_divergence" -> (qKlDivergence _),
    "q_mutual_info" -> (qMutualInfo _),
    "q_js_sources" -> (qJsSources _),
    "q_survival_curve" -> (qSurvivalCurve _),
    "q_gini_split" -> (qGiniSplit _),
    "q_psi_drift" -> (qPsiDrift _),
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "q_seasonal_decompose" -> (qSeasonalDecompose _),
    "q_mmr_rerank" -> (qMmrRerank _),
    "q_topk_churn" -> (qTopkChurn _),
    "q_hll_distinct" -> (qHllDistinct _),
    "q_lm_perplexity" -> (qLmPerplexity _),
    "q_brier_calibration" -> (qBrierCalibration _),
    "q_pca_power" -> (qPcaPower _),
    "q_watermark_fit" -> (qWatermarkFit _),
    "q_oov_rate" -> (qOovRate _),
    "q_bpe_apply" -> (qBpeApply _),
    "q_link_predict" -> (qLinkPredict _),
    "q_isotonic_calibrate" -> (qIsotonicCalibrate _),
    "q_er_weights" -> (qErWeights _),
    "q_running_topk" -> (qRunningTopk _),
    "q_neyman_alloc" -> (qNeymanAlloc _),
    "q_naive_forecast" -> (qNaiveForecast _),
    "q_freshness_decay" -> (qFreshnessDecay _),
    "q_part_top_shipments" -> (qPartTopShipments _),
    "q_ipf_raking" -> (qIpfRaking _),
    "q_markov_attribution" -> (qMarkovAttribution _),
    "q_temperature_fit" -> (qTemperatureFit _),
    "q_jaro_er" -> (qJaroEr _),
    "q_shapley_attribution" -> (qShapleyAttribution _),
    "q_frequent_triples" -> (qFrequentTriples _),
    "q_cuped" -> (qCuped _),
    "q_ols_closed" -> (qOlsClosed _),
    "q_logistic_step" -> (qLogisticStep _),
    "q_merkle_diff" -> (qMerkleDiff _),
    "q_sprt" -> (qSprt _),
    "q_xcorr_leadlag" -> (qXcorrLeadlag _),
    "q_mcnemar" -> (qMcnemar _),
    "q_jackknife_sources" -> (qJackknifeSources _),
    "q_bradley_terry" -> (qBradleyTerry _),
    "q_simpson_reversal" -> (qSimpsonReversal _),
    "q_crossval_ols" -> (qCrossvalOls _),
    "q_uncertainty_sample" -> (qUncertaintySample _),
    "q_bom_rollup" -> (qBomRollup _),
    "q_permutation_test" -> (qPermutationTest _),
    "q_pagerank_iter" -> (qPagerankIter _),
    "q_graph_modularity" -> (qGraphModularity _),
    "q_assortativity" -> (qAssortativity _),
    "q_mann_whitney" -> (qMannWhitney _),
    "q_rule_confidence" -> (qRuleConfidence _),
    "q_fdr_bh" -> (qFdrBh _),
    "q_power_analysis" -> (qPowerAnalysis _),
    "q_ess_weights" -> (qEssWeights _),
    "q_propensity_strata" -> (qPropensityStrata _),
    "q_kn_smooth" -> (qKnSmooth _),
    "q_wilson_ci" -> (qWilsonCi _),
    "q_cohens_kappa" -> (qCohensKappa _),
    "q_kendall_tau" -> (qKendallTau _),
    "q_silhouette" -> (qSilhouette _),
  )

  /** The [[qMmrRerank]] oracle: the 5 greedy MMR steps as chained
    * MATERIALIZED CTEs (materialization is load-bearing — DuckDB inlines
    * multiply-referenced CTEs, and the selected-set chain references each
    * step several times). */
  private def mmrOracleSql: String = {
    val head =
      "WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "p AS (SELECT emb AS p_emb FROM e WHERE vec_id = 0), " +
        "c AS MATERIALIZED (SELECT vec_id AS vec, emb, " +
        "CAST(round(list_cosine_similarity(emb, p_emb) * 10000, 0) AS BIGINT) AS rel_e4 " +
        "FROM e CROSS JOIN p WHERE vec_id <> 0 ORDER BY rel_e4 DESC, vec LIMIT 20), " +
        "m AS MATERIALIZED (SELECT a.vec AS av, b.vec AS bv, " +
        "CAST(round(list_cosine_similarity(a.emb, b.emb) * 10000, 0) AS BIGINT) AS s_e4 " +
        "FROM c a JOIN c b ON a.vec <> b.vec), " +
        "s1 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS step, vec, rel_e4, " +
        "CAST(0 AS BIGINT) AS div_e4, rel_e4 * 7 AS score FROM c " +
        "ORDER BY score DESC, vec LIMIT 1), " +
        "sel1 AS (SELECT vec FROM s1), "
    val steps = (2 to 5).map { i =>
      s"r$i AS (SELECT c.vec, c.rel_e4, coalesce((SELECT max(m.s_e4) FROM m " +
        s"WHERE m.av = c.vec AND m.bv IN (SELECT vec FROM sel${i - 1})), 0) AS div_e4 " +
        s"FROM c WHERE c.vec NOT IN (SELECT vec FROM sel${i - 1})), " +
        s"s$i AS MATERIALIZED (SELECT CAST($i AS BIGINT) AS step, vec, rel_e4, div_e4, " +
        s"rel_e4 * 7 - div_e4 * 3 AS score FROM r$i ORDER BY score DESC, vec LIMIT 1), " +
        s"sel$i AS (SELECT vec FROM sel${i - 1} UNION ALL SELECT vec FROM s$i), "
    }.mkString
    val all = head + steps
    all.stripSuffix(", ") + " " +
      "SELECT step, vec, rel_e4, div_e4, score FROM (" +
      (1 to 5).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ") +
      ") ORDER BY step"
  }

  /** Shared CTE prefix for the training-prep oracles: normalized text with
    * the source column, tokens with positions (empty-text docs dropped —
    * the native shingle expression emits no tokens for them). */
  private val TP_TOK_CTE =
    """WITH norm AS (SELECT doc_id, source, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)""" +
    ", tok AS (SELECT doc_id, source, unnest(string_split(t, ' ')) AS token, " +
    "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm WHERE t <> '')"

  /** Shared CTE chain for the evaluation-metric oracles: deterministic
    * integer score (elementwise-rounded Knuth-seed dot), global
    * (score, vec_id) ranking and the corpus total. */
  private val SCORED_EMB_CTE =
    "WITH v AS (SELECT list_transform(generate_series(1, 64), j -> " +
      "CAST((j * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5) AS v), " +
      "e AS (SELECT vec_id, CAST(label AS BIGINT) AS label, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), " +
      "z AS (SELECT vec_id, label, unnest(emb) AS val, unnest(v) AS vv FROM e CROSS JOIN v), " +
      "sc AS (SELECT vec_id, label, CAST(sum(CAST(round(val * vv * 1000000, 0) AS BIGINT)) AS BIGINT) AS score " +
      "FROM z GROUP BY 1, 2), " +
      "r AS (SELECT vec_id, label, score, CAST(row_number() OVER (ORDER BY score, vec_id) AS BIGINT) AS rank FROM sc), " +
      "t AS (SELECT count(*) AS n_total FROM sc)"

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice, l_returnflag FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice, l_returnflag",
    "q_filter_nonnull" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE props IS NOT NULL AND event_type <> 'error' ORDER BY event_id",
    "q_distinct_ids" ->
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    "q_sorted_distinct" ->
      "SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey IS NOT NULL ORDER BY l_partkey",
    "q_dedup_first_wins" ->
      "SELECT user_id, event_id, event_type FROM (SELECT user_id, event_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) t WHERE rn = 1 ORDER BY user_id",
    "q_dedup_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "q_seeded_sample" ->
      "SELECT c_custkey, ((c_custkey % 2147483648) * 2654435761) % 4294967296 AS h FROM customer ORDER BY h, c_custkey LIMIT 20",
    "q_batch_assign" ->
      "SELECT c_custkey, c_name, CAST(floor((row_number() OVER (ORDER BY c_custkey) - 1) / 500) AS BIGINT) + 1 AS batch_id FROM customer ORDER BY c_custkey",
    "q_normalize_text" ->
      """SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm_text FROM documents ORDER BY doc_id""",
    "q_json_extract" ->
      "SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST",
    "q_bridge_table" ->
      "SELECT DISTINCT o_orderkey, c_custkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey",
    "q_semi_join" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') ORDER BY l_orderkey, l_linenumber, l_quantity",
    "q_partitioned_counts" ->
      "SELECT CAST(ts AS DATE) AS event_date, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
    "q_entity_counts" ->
      Tables.entityNames.map(n => s"SELECT '$n' AS entity, count(*) AS n FROM $n")
        .mkString("SELECT entity, n FROM (", " UNION ALL ", ") t ORDER BY entity"),
    "q_agg_pricing" ->
      ("WITH u AS (SELECT l_returnflag, l_linestatus, " +
        "CAST(round(l_quantity) AS BIGINT) AS q, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS pc, " +
        "CAST(round(l_discount * 10000) AS BIGINT) AS d4 " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'), " +
        "b AS (SELECT l_returnflag, l_linestatus, CAST(sum(q) AS BIGINT) AS sq, " +
        "CAST(sum(pc) AS BIGINT) AS spc, CAST(sum(pc * (10000 - d4)) AS BIGINT) AS se6, " +
        "CAST(sum(d4) AS BIGINT) AS sd4, count(*) AS n FROM u GROUP BY 1, 2) " +
        "SELECT l_returnflag, l_linestatus, CAST(sq AS DOUBLE) AS sum_qty, " +
        "CAST(spc AS DOUBLE) / 100.0 AS sum_base, " +
        "CAST(se6 AS DOUBLE) / 1000000.0 AS sum_disc, " +
        "CAST(" + roundDivSql("sq", "n", 100L) + " AS DOUBLE) / 100.0 AS avg_qty, " +
        "CAST(" + roundDivSql("spc", "n", 1L) + " AS DOUBLE) / 100.0 AS avg_price, " +
        "CAST(" + roundDivSql("sd4", "n", 1L) + " AS DOUBLE) / 10000.0 AS avg_disc, " +
        "n FROM b ORDER BY l_returnflag, l_linestatus"),
    "q_join_agg" ->
      ("SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"),
    "q_window_topk" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q_window_running" ->
      ("SELECT user_id, event_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running FROM events ORDER BY user_id, event_id"),
    "q_set_ops" ->
      ("SELECT o_custkey FROM (SELECT o_custkey FROM orders EXCEPT SELECT o_custkey FROM orders " +
        "JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'R') t ORDER BY o_custkey"),
    "q_text_tokens" ->
      (NORM_CTE +
        ", tok AS (SELECT lang, unnest(string_split(t, ' ')) AS token FROM norm)" +
        ", counted AS (SELECT lang, token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY lang, token)" +
        ", ranked AS (SELECT lang, token, cnt, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rn FROM counted) " +
        "SELECT lang, token, cnt, rn FROM ranked WHERE rn <= 10 ORDER BY lang, rn"),
    "q_minhash_signature" ->
      (SIG_CTE + " SELECT doc_id, mh1, mh2, mh3, mh4 FROM sig ORDER BY doc_id"),
    "q_setsim_join" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm)" +
        ", shw AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle " +
        "FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", sh3 AS (SELECT DISTINCT doc_id, shingle FROM shw WHERE shingle IS NOT NULL)" +
        ", dfc AS (SELECT shingle, count(*) AS df FROM sh3 GROUP BY shingle HAVING count(*) <= 10)" +
        ", cs AS (SELECT sh3.doc_id, sh3.shingle, dfc.df FROM sh3 JOIN dfc USING (shingle))" +
        ", sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM cs GROUP BY doc_id)" +
        ", pr AS (SELECT doc_id, shingle FROM (" +
        "SELECT cs.doc_id, cs.shingle, row_number() OVER (PARTITION BY cs.doc_id ORDER BY cs.df, cs.shingle) AS rn, sz.sz " +
        "FROM cs JOIN sz USING (doc_id)) WHERE rn <= sz - (7 * sz + 9) // 10 + 1)" +
        ", cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM pr a JOIN pr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)" +
        ", inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i " +
        "FROM cand c JOIN cs x ON x.doc_id = c.id_a JOIN cs y ON y.doc_id = c.id_b AND y.shingle = x.shingle " +
        "GROUP BY 1, 2) " +
        "SELECT id_a, id_b, (i * 1000) // (sa.sz + sb.sz - i) AS jac_permille " +
        "FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b " +
        "WHERE (i * 1000) // (sa.sz + sb.sz - i) >= 700 ORDER BY id_a, id_b"),
    "q_minhash_dedup" ->
      (SIG_CTE + ", pairs AS (" +
        (1 to 4).map(i =>
          s"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.mh$i = b.mh$i AND a.doc_id < b.doc_id " +
            s"WHERE a.mh$i IN (SELECT mh$i FROM sig GROUP BY mh$i HAVING count(*) <= 1000)")
          .mkString(" UNION ") +
        ") SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b"),
    "q_ngram_jaccard" ->
      (NORM_CTE.replace("FROM documents", "FROM documents WHERE doc_id % 50 = 0") +
        ", tok AS (SELECT DISTINCT doc_id, lang, unnest(string_split(t, ' ')) AS token FROM norm)" +
        ", tok2 AS (SELECT * FROM tok WHERE token <> '')" +
        ", sz AS (SELECT doc_id, count(*) AS sz FROM tok2 GROUP BY doc_id)" +
        ", dfc AS (SELECT lang, token FROM tok2 GROUP BY lang, token HAVING count(*) BETWEEN 2 AND 1000)" +
        ", tok3 AS (SELECT t.* FROM tok2 t JOIN dfc USING (lang, token))" +
        ", inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c FROM tok3 a JOIN tok3 b " +
        "ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) " +
        ", ju AS (SELECT id_a, id_b, c, sa.sz + sb.sz - c AS u FROM inter " +
        "JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id) " +
        "SELECT id_a, id_b, " +
        "CAST(" + roundDivSql("c", "u", 10000L) + " AS DOUBLE) / 10000.0 AS jaccard " +
        "FROM ju WHERE c * 2 >= u ORDER BY id_a, id_b"),
    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents ORDER BY doc_id""",
    "q_exact_dedup" ->
      ("""WITH fp AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f FROM documents) """ +
        "SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS canonical_id, " +
        "doc_id = min(doc_id) OVER (PARTITION BY f) AS is_canonical FROM fp ORDER BY doc_id"),
    "q_quality_score" ->
      (NORM_CTE + " SELECT doc_id, len(string_split(t, ' ')) AS n_tokens, length(t) AS n_chars_norm, " +
        "round(CAST(length(t) AS DOUBLE) / nullif(len(string_split(t, ' ')), 0), 4) AS chars_per_token, " +
        s"round(CAST(len(list_filter(string_split(t, ' '), x -> x IN $STOP_SQL)) AS DOUBLE) / nullif(len(string_split(t, ' ')), 0), 4) AS stopword_ratio, " +
        "round(CAST(length(t) - length(regexp_replace(t, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / nullif(length(t), 0), 4) AS punct_ratio " +
        "FROM norm ORDER BY doc_id"),
    "q_asof_join" ->
      ("SELECT event_id, user_id, o_orderkey FROM (SELECT e.event_id, e.user_id, o.o_orderkey, " +
        "row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn " +
        "FROM events e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t " +
        "WHERE rn = 1 ORDER BY event_id"),
    "q_asof_nearest" ->
      ("WITH p AS (SELECT e.event_id, e.user_id, o.o_orderkey, " +
        "abs(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(o.o_orderdate)) AS dist_us, " +
        "CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END AS fwd, " +
        "CASE WHEN o.o_orderdate <= e.ts THEN -o.o_orderkey ELSE o.o_orderkey END AS tb " +
        "FROM events e JOIN orders o ON o.o_custkey = e.user_id) " +
        "SELECT event_id, user_id, o_orderkey, dist_us FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY dist_us, fwd, tb) AS rn FROM p) t " +
        "WHERE rn = 1 ORDER BY event_id"),
    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "q_token_count" ->
      (NORM_CTE + " SELECT doc_id, len(list_filter(string_split(t, ' '), x -> x <> '')) AS ws_tokens, " +
        """len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpeish_tokens """ +
        "FROM norm JOIN documents USING (doc_id) ORDER BY doc_id"),
    "q_trending" ->
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT day, event_type, CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day " +
        "RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n7 FROM daily), " +
        "k AS (SELECT day, event_type, n7, CAST(row_number() OVER (PARTITION BY day " +
        "ORDER BY n7 DESC, event_type) AS BIGINT) AS rnk FROM r) " +
        "SELECT day, rnk, event_type, n7 FROM k WHERE rnk <= 3 ORDER BY day, rnk"),
    "q_window_range" ->
      ("SELECT user_id, event_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id " +
        "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS recent_sum FROM events " +
        "ORDER BY user_id, event_id"),
    "q_window_lag" ->
      ("SELECT user_id, event_id, epoch_us(ts) - epoch_us(lag(ts, 1) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us FROM events " +
        "ORDER BY user_id, event_id"),
    "q_set_intersect" ->
      ("SELECT o_custkey FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t ORDER BY o_custkey"),
    "q_monthly_revenue" ->
      ("SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, " +
        "round(sum(o_totalprice), 2) AS revenue, count(*) AS n FROM orders " +
        "GROUP BY 1 ORDER BY 1"),
    "q_batch_format" ->
      ("SELECT c_custkey, printf('batch_%06d.json', batch_id) AS object_name FROM " +
        "(SELECT c_custkey, CAST(floor((row_number() OVER (ORDER BY c_custkey) - 1) / 500) AS BIGINT) + 1 AS batch_id " +
        "FROM customer) t ORDER BY c_custkey"),
    "q_json_struct" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events ORDER BY event_id"),
    "q_cube" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "q_range_join" ->
      ("SELECT o_orderkey, count(*) AS n FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
        "AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY " +
        "GROUP BY o_orderkey ORDER BY o_orderkey"),
    "q_pivot" ->
      ("SELECT l_returnflag, round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F, " +
        "round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_ann_exhaustive" ->
      ("WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), p), 4) AS sim " +
        "FROM embeddings, probe WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 10"),
    "q_ann_lsh_exact" ->
      // hamming == nBits keeps every vector, so the LSH pipeline's exact
      // endpoint is brute-force cosine top-k (the bucket filter still runs
      // on the Spark side — the oracle checks the full pipeline's output)
      ("WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), p), 4) AS sim " +
        "FROM embeddings, probe WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 10"),
    "q_cosine_topk" ->
      ("WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), p), 4) AS sim " +
        "FROM embeddings, probe WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 10"),
    "q_vector_norm" ->
      ("SELECT vec_id, round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2, " +
        "label FROM embeddings ORDER BY vec_id"),
    "q_embed_neardup" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 10 = 0) " +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(list_cosine_similarity(a.v, b.v), 4) AS sim " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.3 ORDER BY id_a, id_b"),
    "q_anti_join" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000) " +
        "ORDER BY c_custkey"),
    "q_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "q_salted_join" ->
      ("SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_sessionize" ->
      ("WITH flagged AS (SELECT user_id, ts, value, " +
        "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 24 HOUR " +
        "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_s FROM events), " +
        "sess AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM flagged) " +
        "SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n, round(sum(value), 2) AS total " +
        "FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start_us"),
    "q_closed_sessions" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events), " +
        "m AS (SELECT user_id, ts_us, CASE WHEN ts_us - lag(ts_us) " +
        "OVER (PARTITION BY user_id ORDER BY ts_us) > 1800000000 THEN 1 ELSE 0 END AS new_s FROM e), " +
        "sd AS (SELECT user_id, ts_us, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM m), " +
        "sess AS (SELECT user_id, sid, min(ts_us) AS start_us, max(ts_us) AS end_us, " +
        "count(*) AS n_events FROM sd GROUP BY user_id, sid), " +
        "t AS (SELECT user_id, max(sid) AS mx FROM sess GROUP BY user_id) " +
        "SELECT s.user_id, s.start_us, s.end_us, s.n_events FROM sess s " +
        "JOIN t USING (user_id) WHERE s.sid < t.mx ORDER BY user_id, start_us"),
    "q_lang_id" ->
      (NORM_CTE +
        ", h AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM norm)" +
        ", c AS (SELECT doc_id, t, " +
        "len(list_filter(toks, x -> x IN ('the','and','of','to','is','a'))) AS en, " +
        "len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht'))) AS de, " +
        "len(list_filter(toks, x -> x IN ('el','la','los','las','es','y'))) AS es, " +
        "len(list_filter(toks, x -> x IN ('le','la','les','et','est','une'))) AS fr FROM h) " +
        "SELECT doc_id, CASE " +
        "WHEN regexp_matches(t, '[\\x{4e00}-\\x{9fff}]') THEN 'zh' " +
        "WHEN de >= greatest(en, es, fr) AND de > 0 THEN 'de' " +
        "WHEN es >= greatest(en, fr) AND es > 0 THEN 'es' " +
        "WHEN fr >= en AND fr > 0 THEN 'fr' " +
        "ELSE 'en' END AS lang_pred FROM c ORDER BY doc_id"),
    "q_percentiles" ->
      // rank selection + exact 20th-unit integer interpolation restated
      // value-for-value with the Spark side (p·20 ∈ {5,10,18} integers;
      // quantile_cont's double `lo + frac·(hi−lo)` rounds engine-specific
      // at .xx5 midpoints)
      ("WITH m AS (SELECT l_returnflag, 'price' AS metric, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem " +
        "UNION ALL SELECT l_returnflag, 'qty', CAST(round(l_quantity) AS BIGINT) FROM lineitem), " +
        "r AS (SELECT l_returnflag, metric, v, " +
        "row_number() OVER (PARTITION BY l_returnflag, metric ORDER BY v) AS rn, " +
        "count(*) OVER (PARTITION BY l_returnflag, metric) AS n FROM m), " +
        "b AS (SELECT l_returnflag, metric, " +
        "max(CASE WHEN rn = ((n-1)*5) // 20 + 1 THEN v END) AS p25_lo, " +
        "max(CASE WHEN rn = ((n-1)*5 + 19) // 20 + 1 THEN v END) AS p25_hi, " +
        "max(CASE WHEN rn = ((n-1)*10) // 20 + 1 THEN v END) AS p50_lo, " +
        "max(CASE WHEN rn = ((n-1)*10 + 19) // 20 + 1 THEN v END) AS p50_hi, " +
        "max(CASE WHEN rn = ((n-1)*18) // 20 + 1 THEN v END) AS p90_lo, " +
        "max(CASE WHEN rn = ((n-1)*18 + 19) // 20 + 1 THEN v END) AS p90_hi, " +
        "max(n) AS n FROM r GROUP BY l_returnflag, metric), " +
        "p AS (SELECT l_returnflag, metric, " +
        "p25_lo*20 + (p25_hi-p25_lo)*(((n-1)*5) % 20) AS p25_20, " +
        "p50_lo*20 + (p50_hi-p50_lo)*(((n-1)*10) % 20) AS p50_20, " +
        "p90_lo*20 + (p90_hi-p90_lo)*(((n-1)*18) % 20) AS p90_20 FROM b) " +
        "SELECT l_returnflag, " +
        "CAST(max(CASE WHEN metric = 'price' THEN p25_20 END) AS DOUBLE) / 2000.0 AS p25, " +
        "CAST(max(CASE WHEN metric = 'price' THEN p50_20 END) AS DOUBLE) / 2000.0 AS p50, " +
        "CAST(max(CASE WHEN metric = 'price' THEN p90_20 END) AS DOUBLE) / 2000.0 AS p90, " +
        "CAST(max(CASE WHEN metric = 'qty' THEN p50_20 END) AS DOUBLE) / 20.0 AS med_qty " +
        "FROM p GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_argmax" ->
      ("SELECT c_mktsegment, c_acctbal AS top_acctbal, c_custkey AS top_custkey, c_name AS top_name " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey DESC) AS rn " +
        "FROM customer) t WHERE rn = 1 ORDER BY c_mktsegment"),
    "q_conditional_agg" ->
      ("SELECT l_returnflag, count(*) FILTER (WHERE l_quantity > 25) AS hi_qty_n, " +
        "round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_rev, " +
        "count(DISTINCT l_partkey) FILTER (WHERE l_quantity < 5) AS lo_qty_parts " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_stats" ->
      ("SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, " +
        "round(var_samp(l_quantity), 4) AS var_qty, " +
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, " +
        "round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_string_agg" ->
      ("SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types, " +
        "count(*) AS n FROM events GROUP BY user_id ORDER BY user_id"),
    "q_map_funcs" ->
      ("SELECT event_id, array_to_string(list_sort(json_keys(props)), ',') AS keys, " +
        "CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events WHERE props IS NOT NULL ORDER BY event_id"),
    "q_date_parse" ->
      ("WITH raw AS (SELECT o_orderkey, CASE CAST(o_orderkey % 3 AS INTEGER) " +
        "WHEN 0 THEN strftime(o_orderdate, '%Y') " +
        "WHEN 1 THEN strftime(o_orderdate, '%Y-%m') " +
        "ELSE strftime(o_orderdate, '%Y-%m-%d') END AS release_date FROM orders) " +
        "SELECT o_orderkey, release_date, CAST(coalesce(" +
        "try_strptime(release_date, '%Y-%m-%d'), try_strptime(release_date, '%Y-%m'), " +
        "try_strptime(release_date, '%Y')) AS DATE) AS parsed FROM raw ORDER BY o_orderkey"),
    "q_scalar_subquery" ->
      ("SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) ORDER BY c_custkey"),
    "q_exists_subquery" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000) " +
        "ORDER BY c_custkey"),
    "q_ntile" ->
      ("SELECT c_custkey, c_mktsegment, ntile(4) OVER " +
        "(PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile " +
        "FROM customer ORDER BY c_custkey"),
    "q_first_last" ->
      ("SELECT user_id, event_id, " +
        "first_value(value) OVER w AS first_val, last_value(value) OVER w AS last_val " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY user_id, event_id"),
    "q_unpivot" ->
      ("WITH m AS (SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS v FROM lineitem " +
        "UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem " +
        "UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem) " +
        "SELECT l_returnflag, metric, round(sum(v), 2) AS total, count(*) AS n " +
        "FROM m GROUP BY l_returnflag, metric ORDER BY l_returnflag, metric"),
    "q_explode_outer" ->
      (NORM_CTE +
        ", toks AS (SELECT doc_id, unnest(list_filter(string_split(t, ' '), x -> length(x) >= 8)) AS token FROM norm) " +
        "SELECT doc_id, token FROM toks " +
        "UNION ALL SELECT doc_id, NULL AS token FROM norm WHERE doc_id NOT IN (SELECT doc_id FROM toks) " +
        "ORDER BY doc_id, token NULLS FIRST"),
    "q_regexp_extract" ->
      ("SELECT p_partkey, regexp_extract(p_name, '^(\\w+)', 1) AS first_word, " +
        "regexp_extract(p_type, '(\\w+)$', 1) AS last_type_word, " +
        "regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num " +
        "FROM part ORDER BY p_partkey"),
    "q_array_funcs" ->
      ("WITH t AS (SELECT user_id, list_sort(list_distinct(list(event_type))) AS types FROM events GROUP BY user_id) " +
        "SELECT user_id, array_to_string(types, ',') AS types, " +
        "array_to_string(list_filter(types, x -> x IN ('purchase', 'signup', 'error')), ',') AS overlap, " +
        "array_to_string(list_sort(list_distinct(list_concat(types, ['purchase', 'signup', 'error']))), ',') AS combined, " +
        "array_to_string(list_filter(types, x -> x NOT IN ('purchase', 'signup', 'error')), ',') AS extra, " +
        "len(types) AS n_types FROM t ORDER BY user_id"),
    "q_date_arith" ->
      ("SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS due_date, " +
        "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days_since, " +
        "last_day(CAST(o_orderdate AS DATE)) AS month_end, " +
        "isodow(o_orderdate) AS isodow, quarter(o_orderdate) AS qtr " +
        "FROM orders ORDER BY o_orderkey"),
    "q_histogram" ->
      ("SELECT bucket, printf('[%d,%d)', bucket * 50000, (bucket + 1) * 50000) AS range, " +
        "n, CAST(" + roundDivSql("spc", "n", 1L) + " AS DOUBLE) / 100.0 AS avg_price " +
        "FROM (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, " +
        "count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spc " +
        "FROM orders GROUP BY 1) t ORDER BY bucket"),
    "q_full_outer" ->
      ("WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS orders_n FROM orders GROUP BY 1), " +
        "e AS (SELECT CAST(ts AS DATE) AS day, count(*) AS events_n FROM events GROUP BY 1) " +
        "SELECT coalesce(o.day, e.day) AS day, coalesce(orders_n, 0) AS orders_n, " +
        "coalesce(events_n, 0) AS events_n FROM o FULL OUTER JOIN e ON o.day = e.day " +
        "ORDER BY day"),
    "q_percent_rank" ->
      ("SELECT c_custkey, c_mktsegment, " +
        "round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd " +
        "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) " +
        "ORDER BY c_custkey"),
    "q_stratified_sample" ->
      ("SELECT c_custkey, c_mktsegment, rn FROM (SELECT c_custkey, c_mktsegment, " +
        "row_number() OVER (PARTITION BY c_mktsegment ORDER BY ((c_custkey % 2147483648) * 2654435761) % 4294967296, c_custkey) AS rn " +
        "FROM customer) t WHERE rn <= 5 ORDER BY c_mktsegment, rn"),
    "q_scd2" ->
      ("SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS valid_from, " +
        "lead(CAST(o_orderdate AS DATE), 1) OVER w AS valid_to, " +
        "lead(CAST(o_orderdate AS DATE), 1) OVER w IS NULL AS is_current " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_custkey, valid_from, o_orderkey"),
    "q_binary_meta" ->
      ("SELECT doc_id, octet_length(encode(text)) AS byte_len, length(text) AS char_len, " +
        "md5(text) AS digest, lower(hex(encode(substr(text, 1, 4)))) AS magic " +
        "FROM documents ORDER BY doc_id"),
    "q_union_by_name" ->
      ("SELECT id, name, acctbal, src FROM (" +
        "SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer " +
        "UNION ALL SELECT s_suppkey, s_name, NULL, 'supplier' FROM supplier) t " +
        "ORDER BY src, id"),
    "q_tumbling_window" ->
      ("SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS window_start_us, event_type, " +
        "count(*) AS n, round(sum(value), 2) AS total FROM events " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_bloom_semi_join" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000) " +
        "ORDER BY l_orderkey, l_linenumber, l_extendedprice"),
    "q_date_series" ->
      ("WITH months AS (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-08-01', INTERVAL 1 MONTH)) AS DATE) AS month), " +
        "rev AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, " +
        "round(sum(o_totalprice), 2) AS revenue, count(*) AS n FROM orders GROUP BY 1) " +
        "SELECT m.month, coalesce(rev.revenue, 0.0) AS revenue, coalesce(rev.n, 0) AS n " +
        "FROM months m LEFT JOIN rev ON m.month = rev.month ORDER BY m.month"),
    "q_merge_upsert" ->
      ("WITH upd AS (" +
        "SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 1000, 2) AS c_acctbal, 'UPDATED' AS c_mktsegment " +
        "FROM customer WHERE c_custkey % 7 = 0 " +
        "UNION ALL SELECT -c_custkey - 1, c_name, c_nationkey, c_acctbal, 'INSERTED' " +
        "FROM customer WHERE c_custkey % 13 = 0), " +
        "merged AS (SELECT *, 0 AS pri FROM upd " +
        "UNION ALL SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 1 AS pri FROM customer) " +
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY pri) AS rn FROM merged) t " +
        "WHERE rn = 1 ORDER BY c_custkey"),
    "q_cdc_apply" ->
      ("SELECT user_id, event_type, value, ts_us FROM (" +
        "SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) t " +
        "WHERE rn = 1 AND event_type IS DISTINCT FROM 'error' ORDER BY user_id"),
    "q_string_funcs" ->
      ("SELECT p_partkey, upper(p_name) AS up, lpad(p_brand, 12, '#') AS padded, " +
        "reverse(p_type) AS rev, regexp_replace(p_name, ' ', '_', 'g') AS snake, " +
        "repeat(p_brand, 2) AS doubled, levenshtein(p_type, 'ECONOMY') AS edit_dist " +
        "FROM part ORDER BY p_partkey"),
    "q_sliding_window" ->
      ("SELECT ((epoch_us(ts) // 10800000000) - k.i) * 10800000000 AS window_start_us, " +
        "count(*) AS n, round(sum(value), 2) AS total " +
        "FROM events, (VALUES (0), (1)) k(i) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_minhash_dedup_map" ->
      (SIG_CTE +
        ", melted AS (" +
        (1 to 4).map(i => s"SELECT doc_id, $i AS band_idx, mh$i AS band_val FROM sig")
          .mkString(" UNION ALL ") +
        "), reps AS (SELECT band_idx, band_val, min(doc_id) AS rep FROM melted GROUP BY band_idx, band_val) " +
        "SELECT m.doc_id, min(r.rep) AS canonical_id FROM melted m " +
        "JOIN reps r ON m.band_idx = r.band_idx AND m.band_val = r.band_val " +
        "GROUP BY m.doc_id ORDER BY m.doc_id"),
    "q_leakage_split" ->
      (SIG_CTE +
        ", melted AS MATERIALIZED (" +
        (1 to 4).map(i => s"SELECT doc_id, $i AS band_idx, mh$i AS band_val FROM sig")
          .mkString(" UNION ALL ") +
        "), l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS c FROM (SELECT DISTINCT doc_id FROM melted))" +
        (1 to LeakageSplitCap).map { i =>
          val p = i - 1
          s", r$i AS MATERIALIZED (SELECT m.band_idx, m.band_val, min(l.c) AS rep " +
            s"FROM melted m JOIN l$p l ON m.doc_id = l.id GROUP BY 1, 2)" +
            s", h$i AS MATERIALIZED (SELECT m.doc_id AS id, min(r.rep) AS c " +
            s"FROM melted m JOIN r$i r ON m.band_idx = r.band_idx AND m.band_val = r.band_val GROUP BY 1)" +
            s", l$i AS MATERIALIZED (SELECT a.id, b.c FROM h$i a JOIN h$i b ON a.c = b.id)"
        }.mkString + " " +
        s"SELECT id AS doc_id, c AS canonical_id, " +
        "CASE WHEN ((c % 2147483648) * 2654435761) % 4294967296 % 10 < 8 THEN 'train' " +
        "WHEN ((c % 2147483648) * 2654435761) % 4294967296 % 10 = 8 THEN 'val' " +
        s"ELSE 'test' END AS split FROM l$LeakageSplitCap ORDER BY doc_id"),
    "q_decontaminate" ->
      (TP_TOK_CTE +
        ", sh AS (SELECT doc_id, source, token" +
        (1 to 7).map(i => s" || ' ' || lead(token, $i) OVER w").mkString +
        " AS shingle FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", bench AS (SELECT DISTINCT md5(shingle) AS h FROM sh WHERE source = 'src0' AND shingle IS NOT NULL)" +
        ", corp AS (SELECT DISTINCT doc_id, md5(shingle) AS h FROM sh WHERE source <> 'src0' AND shingle IS NOT NULL) " +
        "SELECT c.doc_id, count(*) AS n_shared FROM corp c JOIN bench b ON c.h = b.h " +
        "GROUP BY c.doc_id ORDER BY c.doc_id"),
    "q_repetition_score" ->
      (TP_TOK_CTE +
        ", uni AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT token) AS nd FROM tok GROUP BY doc_id)" +
        ", bi0 AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w AS sh FROM tok " +
        "WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", bi1 AS (SELECT doc_id, sh, count(*) AS c FROM bi0 WHERE sh IS NOT NULL GROUP BY doc_id, sh)" +
        ", bi AS (SELECT doc_id, max(c) AS topc, CAST(sum(c) AS BIGINT) AS nbi FROM bi1 GROUP BY doc_id) " +
        "SELECT u.doc_id, n_tokens, round(1.0 - nd / n_tokens, 4) AS dup_word_frac, " +
        "round(topc / nbi, 4) AS top_bigram_frac FROM uni u LEFT JOIN bi USING (doc_id) ORDER BY doc_id"),
    "q_tfidf" ->
      (TP_TOK_CTE +
        ", tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token)" +
        ", dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token)" +
        ", scored AS (SELECT doc_id, token, (tf * 1000000000) // df AS score " +
        "FROM tf JOIN dft USING (token))" +
        ", ranked AS (SELECT doc_id, token, score, CAST(row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rk FROM scored) " +
        "SELECT doc_id, token, score, rk FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"),
    "q_vocab_build" ->
      (TP_TOK_CTE +
        ", c AS (SELECT token, count(*) AS n FROM tok GROUP BY token)" +
        ", r AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS vocab_id, token, n FROM c) " +
        "SELECT vocab_id, token, n FROM r WHERE vocab_id <= 100 ORDER BY vocab_id"),
    "q_dataset_mixture" ->
      ("SELECT doc_id, source, lang FROM documents " +
        "WHERE ((((doc_id % 2147483648) + 7) * 2654435761) % 4294967296) % 1000 < " +
        "(CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 500 WHEN 'src2' THEN 500 ELSE 200 END) " +
        "ORDER BY doc_id"),
    "q_pack_sequences" ->
      ("""WITH t AS (SELECT doc_id, len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n_tokens FROM documents)""" +
        ", p AS (SELECT doc_id, n_tokens, CAST(coalesce(sum(n_tokens) OVER " +
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset FROM t) " +
        "SELECT doc_id, n_tokens, start_offset, start_offset // 256 AS pack_id, " +
        "start_offset % 256 AS pack_offset FROM p ORDER BY doc_id"),
    "q_quality_filter" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm WHERE t <> '')" +
        ", uni AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT token) AS nd FROM tok GROUP BY doc_id)" +
        ", bi0 AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w AS sh FROM tok " +
        "WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", bi1 AS (SELECT doc_id, sh, count(*) AS c FROM bi0 WHERE sh IS NOT NULL GROUP BY doc_id, sh)" +
        ", bi AS (SELECT doc_id, max(c) AS topc, CAST(sum(c) AS BIGINT) AS nbi FROM bi1 GROUP BY doc_id)" +
        ", f AS (SELECT u.doc_id, n_tokens BETWEEN 20 AND 100000 AS length_ok, " +
        "round(1.0 - nd / n_tokens, 4) <= 0.6 AS repetition_ok, " +
        "coalesce(round(topc / nbi, 4) <= 0.2, TRUE) AS bigram_ok " +
        "FROM uni u LEFT JOIN bi USING (doc_id)) " +
        "SELECT doc_id, length_ok, repetition_ok, bigram_ok, " +
        "length_ok AND repetition_ok AND bigram_ok AS keep FROM f ORDER BY doc_id"),
    "q_ngram_counts" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, lang, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm WHERE t <> '')" +
        ", bi0 AS (SELECT lang, token || ' ' || lead(token, 1) OVER " +
        "(PARTITION BY doc_id ORDER BY pos) AS bigram FROM tok)" +
        ", cnt AS (SELECT lang, bigram, count(*) AS n FROM bi0 WHERE bigram IS NOT NULL GROUP BY lang, bigram)" +
        ", rk AS (SELECT lang, bigram, n, row_number() OVER " +
        "(PARTITION BY lang ORDER BY n DESC, bigram) AS rk FROM cnt) " +
        "SELECT lang, bigram, n, rk FROM rk WHERE rk <= 20 ORDER BY lang, rk"),
    "q_kmeans_step" ->
      ("WITH cents AS (SELECT vec_id AS cluster_id, embedding::DOUBLE[] AS centroid " +
        "FROM embeddings ORDER BY vec_id LIMIT 8)" +
        ", assigned AS (SELECT vec_id, cluster_id FROM (" +
        "SELECT e.vec_id, c.cluster_id, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_distance(e.embedding::DOUBLE[], c.centroid), c.cluster_id) AS rn " +
        "FROM embeddings e CROSS JOIN cents c) t WHERE rn = 1)" +
        ", exploded AS (SELECT a.cluster_id, u.pos, u.val " +
        "FROM assigned a JOIN embeddings e USING (vec_id), " +
        "LATERAL (SELECT unnest(e.embedding::DOUBLE[]) AS val, " +
        "generate_subscripts(e.embedding, 1) AS pos) u) " +
        ", agg AS (SELECT cluster_id, pos, " +
        "CAST(sum(CAST(round(val * 1e6) AS BIGINT)) AS BIGINT) AS sq, count(*) AS n " +
        "FROM exploded GROUP BY cluster_id, pos) " +
        "SELECT cluster_id, pos - 1 AS pos, " +
        "CAST((sq + (CASE WHEN sq < 0 THEN -50 ELSE 50 END) * n) // (100 * n) AS BIGINT) AS c, " +
        "n FROM agg ORDER BY cluster_id, pos"),
    "q_vector_quantize" ->
      ("WITH m AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
        "list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma FROM embeddings) " +
        "SELECT vec_id, round(CASE WHEN ma = 0 THEN 0.0 ELSE ma / 127.0 END, 6) AS scale, " +
        "array_to_string(CASE WHEN ma = 0 THEN list_transform(v, x -> 0) " +
        "ELSE list_transform(v, x -> CAST(round(x * 127.0 / ma, 0) AS INTEGER)) END, ',') AS q, " +
        "round(coalesce(CASE WHEN ma = 0 THEN 0.0 " +
        "ELSE list_max(list_transform(v, x -> abs(x - round(x * 127.0 / ma, 0) * ma / 127.0))) END, 0.0), 6) AS max_err " +
        "FROM m ORDER BY vec_id"),
    "q_knn_join" ->
      ("WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id % 20 = 0), " +
        "p AS (SELECT q_id, e.vec_id AS n_id, round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), 4) AS sim " +
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q_id), " +
        "r AS (SELECT q_id, n_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk FROM p) " +
        "SELECT q_id, n_id, sim, rk FROM r WHERE rk <= 3 ORDER BY q_id, rk"),
    "q_knn_join_blocked" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT vec_id AS cid, v AS c FROM e ORDER BY vec_id LIMIT 8), " +
        "assigned AS (SELECT vec_id, cid AS cluster_id FROM (" +
        "SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_distance(e.v, c.c), c.cid) AS rn FROM e CROSS JOIN cents c) t WHERE rn = 1), " +
        "withv AS (SELECT a.vec_id, a.cluster_id, e.v FROM assigned a JOIN e USING (vec_id)), " +
        "p AS (SELECT q.vec_id AS q_id, x.vec_id AS n_id, round(list_cosine_similarity(x.v, q.v), 4) AS sim " +
        "FROM withv q JOIN withv x ON q.cluster_id = x.cluster_id AND x.vec_id <> q.vec_id " +
        "WHERE q.vec_id % 20 = 0), " +
        "r AS (SELECT q_id, n_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk FROM p) " +
        "SELECT q_id, n_id, sim, rk FROM r WHERE rk <= 3 ORDER BY q_id, rk"),
    "q_sem_dedup" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        // adaptive cluster count (identity k=8 up to 20k vectors): the
        // same k = max(8, n div 2500) rule the Spark side declares
        "cents AS (SELECT vec_id AS cid, v AS c FROM e ORDER BY vec_id " +
        "LIMIT greatest(8, (SELECT count(*) FROM e) // 2500)), " +
        "assigned AS (SELECT vec_id, cid AS cluster_id FROM (" +
        "SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_distance(e.v, c.c), c.cid) AS rn FROM e CROSS JOIN cents c) t WHERE rn = 1), " +
        "withv AS (SELECT a.vec_id, a.cluster_id, e.v FROM assigned a JOIN e USING (vec_id)) " +
        "SELECT x.cluster_id, x.vec_id AS id_a, y.vec_id AS id_b, round(list_cosine_similarity(x.v, y.v), 4) AS sim " +
        "FROM withv x JOIN withv y ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id " +
        "WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.3 ORDER BY id_a, id_b"),
    "q_minhash_est" ->
      (SIG_CTE + ", pairs AS (" +
        (1 to 4).map(i =>
          s"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.mh$i = b.mh$i AND a.doc_id < b.doc_id " +
            s"WHERE a.mh$i IN (SELECT mh$i FROM sig GROUP BY mh$i HAVING count(*) <= 1000)")
          .mkString(" UNION ") +
        ") SELECT p.id_a, p.id_b, CAST(" +
        (1 to 4).map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ") +
        " AS BIGINT) AS matches, CAST(" +
        (1 to 4).map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ") +
        " AS DOUBLE) / 4.0 AS est_jaccard " +
        "FROM pairs p JOIN sig a ON p.id_a = a.doc_id JOIN sig b ON p.id_b = b.doc_id ORDER BY id_a, id_b"),
    "q_bm25" ->
      (NORM_CTE +
        ", tok0 AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token FROM norm)" +
        ", tok AS (SELECT * FROM tok0 WHERE token <> '')" +
        ", dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)" +
        ", st AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl)" +
        ", av AS (SELECT n_docs, (total * 1000000) // n_docs AS avgdl6 FROM st)" +
        ", tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE token IN ('vector', 'stream', 'hash') GROUP BY doc_id, token)" +
        ", dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token)" +
        ", sc AS (SELECT doc_id, (((1000000 * (2 * n_docs - 2 * df + 1)) // (2 * df + 1)) * tf * 2200) // " +
        "(tf * 1000 + (1200 * (250 + (750000000 * dl) // avgdl6)) // 1000) AS ts " +
        "FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id) CROSS JOIN av) " +
        "SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score FROM sc GROUP BY doc_id " +
        "ORDER BY score DESC, doc_id LIMIT 10"),
    "q_dup_ngram_spans" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm)" +
        ", sh AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle " +
        "FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", dist AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL)" +
        ", dfc AS (SELECT doc_id, count(*) OVER (PARTITION BY shingle) AS df FROM dist) " +
        "SELECT doc_id, count(*) AS n_shingles, " +
        "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, " +
        "(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000) // count(*) AS dup_permille " +
        "FROM dfc GROUP BY doc_id ORDER BY doc_id"),
    "q_substring_dedup" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm)" +
        ", sh AS (SELECT doc_id, pos, token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w " +
        "|| ' ' || lead(token, 3) OVER w || ' ' || lead(token, 4) OVER w AS shingle " +
        "FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", shv AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, shingle FROM sh WHERE shingle IS NOT NULL)" +
        ", dup AS (SELECT shingle FROM (SELECT DISTINCT doc_id, shingle FROM shv) " +
        "GROUP BY shingle HAVING count(*) >= 2)" +
        ", ds AS (SELECT doc_id, pos FROM shv WHERE shingle IN (SELECT shingle FROM dup))" +
        ", cv AS (SELECT doc_id, least(5, coalesce(lead(pos) OVER " +
        "(PARTITION BY doc_id ORDER BY pos) - pos, 5)) AS c FROM ds)" +
        ", cov AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_tokens FROM cv GROUP BY doc_id)" +
        ", nt AS (SELECT doc_id, CAST(CASE WHEN t = '' THEN 0 " +
        "ELSE len(string_split(t, ' ')) END AS BIGINT) AS n_tokens FROM norm) " +
        "SELECT nt.doc_id, n_tokens, coalesce(dup_tokens, 0) AS dup_tokens, " +
        "n_tokens - coalesce(dup_tokens, 0) AS kept_tokens, " +
        "CASE WHEN n_tokens > 0 AND coalesce(dup_tokens, 0) * 2 >= n_tokens THEN 'drop' " +
        "WHEN coalesce(dup_tokens, 0) > 0 THEN 'trim' ELSE 'keep' END AS action " +
        "FROM nt LEFT JOIN cov ON nt.doc_id = cov.doc_id ORDER BY nt.doc_id"),
    "q_funnel" ->
      ("WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id) " +
        "WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id) " +
        "WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id) " +
        "SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name, count(*) AS n_users FROM s1 " +
        "UNION ALL SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2 " +
        "UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3 ORDER BY stage"),
    "q_cohort_retention" ->
      ("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id), " +
        "cells AS (SELECT DISTINCT ev.user_id, CAST(date_trunc('week', cohort_day) AS DATE) AS cohort_week, " +
        "CAST(date_diff('day', cohort_day, day) // 7 AS BIGINT) AS week_offset FROM ev JOIN f USING (user_id)) " +
        "SELECT cohort_week, week_offset, count(*) AS n_users FROM cells " +
        "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"),
    "q_interval_join" ->
      ("SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b, " +
        "date_diff('day', greatest(a.o_orderdate, b.o_orderdate), " +
        "least(a.o_orderdate + INTERVAL 7 DAY, b.o_orderdate + INTERVAL 7 DAY)) AS overlap_days " +
        "FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey " +
        "AND a.o_orderdate < b.o_orderdate + INTERVAL 7 DAY AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY " +
        "ORDER BY a.o_custkey, key_a, key_b"),
    "q_weighted_sample" ->
      ("SELECT * FROM (SELECT o_orderkey, o_totalprice, h, w_cents FROM (" +
        "SELECT o_orderkey, o_totalprice, ((o_orderkey % 2147483648) * 2654435761) % 4294967296 AS h, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS w_cents FROM orders) w " +
        "WHERE w_cents > 0 " +
        "ORDER BY CAST(h AS DOUBLE) / CAST(w_cents AS DOUBLE), o_orderkey LIMIT 30) " +
        "ORDER BY o_orderkey"),
    "q_percentile_gate" ->
      (NORM_CTE +
        ", tk AS (SELECT doc_id, lang, CAST(len(list_filter(string_split(t, ' '), x -> x <> '')) AS BIGINT) AS n_tokens FROM norm)" +
        ", r AS (SELECT doc_id, lang, n_tokens, percent_rank() OVER " +
        "(PARTITION BY lang ORDER BY n_tokens, doc_id) AS pr0 FROM tk) " +
        "SELECT doc_id, lang, n_tokens, round(pr0, 6) AS pr FROM r " +
        "WHERE pr0 >= 0.25 ORDER BY doc_id"),
    "q_zscore" ->
      ("WITH st AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma " +
        "FROM events GROUP BY event_type) " +
        "SELECT event_id, event_type, round((value - mu) / nullif(sigma, 0.0), 4) AS z " +
        "FROM events JOIN st USING (event_type) ORDER BY event_id"),
    "q_event_transitions" ->
      ("WITH tr AS (SELECT user_id, event_type AS from_type, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type FROM events) " +
        "SELECT from_type, to_type, count(*) AS n, count(DISTINCT user_id) AS n_users " +
        "FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type " +
        "ORDER BY from_type, to_type"),
    "q_skyline" ->
      ("WITH d AS (SELECT o_orderpriority, o_orderkey, o_totalprice, " +
        "date_diff('day', DATE '1990-01-01', o_orderdate) AS days FROM orders), " +
        "m AS (SELECT *, max(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY days DESC " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_later FROM d) " +
        "SELECT o_orderpriority, o_orderkey, days, o_totalprice FROM m " +
        "WHERE best_later IS NULL OR o_totalprice > best_later " +
        "ORDER BY o_orderpriority, days, o_orderkey"),
    "q_chunk_windows" ->
      (NORM_CTE +
        ", tk AS (SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS toks FROM norm)" +
        ", nn AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tk WHERE len(toks) > 0)" +
        ", st AS (SELECT doc_id, toks, n, unnest(range(0, n, 4)) AS start FROM nn) " +
        "SELECT doc_id, start // 4 AS chunk_id, start, least(8, n - start) AS n_tok, " +
        "md5(array_to_string(list_slice(toks, start + 1, start + 8), ' ')) AS chunk_md5 " +
        "FROM st ORDER BY doc_id, chunk_id"),
    "q_train_split" ->
      ("WITH b AS (SELECT lang, n_chars, " +
        "((doc_id % 2147483648) * 2654435761) % 4294967296 % 10 AS bucket FROM documents), " +
        "g AS (SELECT CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split, " +
        "lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars FROM b GROUP BY 1, 2) " +
        "SELECT split, lang, n_docs, n_chars, " +
        "CAST((sum(n_docs) OVER (PARTITION BY split) * 1000000) // (count(*) OVER (PARTITION BY split) * n_docs) AS BIGINT) AS weight_ppm " +
        "FROM g ORDER BY split, lang"),
    "q_rarity_score" ->
      (TP_TOK_CTE +
        ", tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token)" +
        ", uni AS (SELECT token, CAST(sum(tf) AS BIGINT) AS ct FROM tf GROUP BY token)" +
        ", tt AS (SELECT CAST(sum(ct) AS BIGINT) AS t_tot FROM uni)" +
        ", sc AS (SELECT doc_id, tf, (t_tot * 1000000) // ct AS rar " +
        "FROM tf JOIN uni USING (token) CROSS JOIN tt) " +
        "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, " +
        "CAST(sum(tf * rar) // sum(tf) AS BIGINT) AS rarity_ppm " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id"),
    "q_pmi_topk" ->
      (TP_TOK_CTE +
        ", uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY token)" +
        ", tt AS (SELECT CAST(sum(c1) AS BIGINT) AS t_tot FROM uni)" +
        ", bg AS (SELECT token AS x, lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS y FROM tok)" +
        ", bc AS (SELECT x, y, count(*) AS c12 FROM bg WHERE y IS NOT NULL GROUP BY x, y HAVING count(*) >= 5) " +
        "SELECT x || ' ' || y AS bigram, c12 AS n, u1.c1 AS cx, u2.c1 AS cy, " +
        "(c12 * t_tot * 100000) // (u1.c1 * u2.c1) AS score " +
        "FROM bc JOIN uni u1 ON bc.x = u1.token JOIN uni u2 ON bc.y = u2.token CROSS JOIN tt " +
        "ORDER BY score DESC, bigram LIMIT 20"),
    "q_global_rank" ->
      ("SELECT doc_id, n_chars, CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rank " +
        "FROM documents ORDER BY rank"),
    "q_mad_outliers" ->
      ("WITH c AS (SELECT event_id, event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events), " +
        "m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM c GROUP BY event_type), " +
        "d AS (SELECT c.event_id, c.event_type, c.cents, m.med, abs(c.cents - m.med) AS adev " +
        "FROM c JOIN m USING (event_type)), " +
        "md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY event_type) " +
        "SELECT event_id, event_type, cents, adev, med, mad FROM d JOIN md USING (event_type) " +
        "WHERE adev > 3 * mad ORDER BY event_id"),
    "q_regr_trend" ->
      ("WITH xy AS (SELECT event_type, CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x, " +
        "CAST(round(value * 100, 0) AS BIGINT) AS y FROM events), " +
        "s AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx FROM xy GROUP BY event_type) " +
        "SELECT event_type, n, " +
        "round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope, " +
        "round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept " +
        "FROM s ORDER BY event_type"),
    "q_next_token" ->
      (TP_TOK_CTE +
        ", uni AS (SELECT token AS context, count(*) AS cx FROM tok GROUP BY token HAVING count(*) >= 10)" +
        ", bg AS (SELECT token AS context, lead(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS y FROM tok)" +
        ", bc AS (SELECT context, y, count(*) AS cxy FROM bg WHERE y IS NOT NULL GROUP BY context, y)" +
        ", r AS (SELECT bc.context, y, cxy, cx, row_number() OVER " +
        "(PARTITION BY bc.context ORDER BY cxy DESC, y) AS rn FROM bc JOIN uni USING (context)) " +
        "SELECT context, y AS next_tok, cxy AS n, " + ppmDivSql("cxy", "cx") + " AS cond_ppm " +
        "FROM r WHERE rn = 1 ORDER BY context"),
    "q_vocab_coverage" ->
      (TP_TOK_CTE +
        ", uni AS (SELECT token, count(*) AS c FROM tok GROUP BY token)" +
        ", tt AS (SELECT CAST(sum(c) AS BIGINT) AS t_tot FROM uni)" +
        ", r AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, token) AS BIGINT) AS rn FROM uni)" +
        ", ks AS (SELECT CAST(unnest([10, 100, 1000]) AS BIGINT) AS k) " +
        "SELECT k, n_vocab, covered, " + ppmDivSql("covered", "t_tot") + " AS share_ppm " +
        "FROM (SELECT k, count(*) AS n_vocab, CAST(sum(c) AS BIGINT) AS covered, t_tot " +
        "FROM ks JOIN r ON r.rn <= ks.k CROSS JOIN tt GROUP BY k, t_tot) g ORDER BY k"),
    "q_dedup_audit" ->
      ("""WITH fp AS (SELECT doc_id, source, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f FROM documents), """ +
        "d AS (SELECT source, CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY f) THEN 0 ELSE 1 END AS is_dup FROM fp) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(is_dup) AS BIGINT) AS n_dups, " +
        "(CAST(sum(is_dup) AS BIGINT) * 1000) // count(*) AS dup_permille " +
        "FROM d GROUP BY source ORDER BY source"),
    "q_langid_confusion" ->
      (NORM_CTE +
        ", h AS (SELECT lang, t, string_split(t, ' ') AS toks FROM norm)" +
        ", c AS (SELECT lang, t, " +
        "len(list_filter(toks, x -> x IN ('the','and','of','to','is','a'))) AS en, " +
        "len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht'))) AS de, " +
        "len(list_filter(toks, x -> x IN ('el','la','los','las','es','y'))) AS es, " +
        "len(list_filter(toks, x -> x IN ('le','la','les','et','est','une'))) AS fr FROM h)" +
        ", p AS (SELECT lang, CASE " +
        "WHEN regexp_matches(t, '[\\x{4e00}-\\x{9fff}]') THEN 'zh' " +
        "WHEN de >= greatest(en, es, fr) AND de > 0 THEN 'de' " +
        "WHEN es >= greatest(en, fr) AND es > 0 THEN 'es' " +
        "WHEN fr >= en AND fr > 0 THEN 'fr' " +
        "ELSE 'en' END AS lang_pred FROM c) " +
        "SELECT lang, lang_pred, count(*) AS n FROM p " +
        "GROUP BY lang, lang_pred ORDER BY lang, lang_pred"),
    "q_cluster_sizes" ->
      (SIG_CTE +
        ", melted AS (" +
        (1 to 4).map(i => s"SELECT doc_id, $i AS band_idx, mh$i AS band_val FROM sig")
          .mkString(" UNION ALL ") +
        "), reps AS (SELECT band_idx, band_val, min(doc_id) AS rep FROM melted GROUP BY band_idx, band_val)" +
        ", map AS (SELECT m.doc_id, min(r.rep) AS canonical_id FROM melted m " +
        "JOIN reps r ON m.band_idx = r.band_idx AND m.band_val = r.band_val GROUP BY m.doc_id)" +
        ", cs AS (SELECT canonical_id, count(*) AS cluster_size FROM map GROUP BY canonical_id) " +
        "SELECT cluster_size, count(*) AS n_clusters, CAST(cluster_size * count(*) AS BIGINT) AS n_docs " +
        "FROM cs GROUP BY cluster_size ORDER BY cluster_size"),
    "q_padding_waste" ->
      ("""WITH nr AS (SELECT source, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents), """ +
        "tk AS (SELECT source, CAST(len(list_filter(string_split(t, ' '), x -> x <> '')) AS BIGINT) AS n FROM nr), " +
        "p AS (SELECT source, n, ((n + 255) // 256) * 256 AS padded FROM tk) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS real_tokens, " +
        "CAST(sum(padded) AS BIGINT) AS padded_tokens, " +
        "((CAST(sum(padded) AS BIGINT) - CAST(sum(n) AS BIGINT)) * 1000) // CAST(sum(padded) AS BIGINT) AS waste_permille " +
        "FROM p GROUP BY source ORDER BY source"),
    "q_ks_drift" ->
      ("""WITH tk AS (SELECT source, CAST(len(list_filter(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '), x -> x <> '')) AS BIGINT) AS v """ +
        "FROM documents WHERE source IN ('src0', 'src1')), " +
        "cnt AS (SELECT v, CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c0, " +
        "CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1 FROM tk GROUP BY v), " +
        "cum AS (SELECT v, CAST(sum(c0) OVER (ORDER BY v) AS BIGINT) AS cum0, " +
        "CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1, " +
        "CAST(sum(c0) OVER () AS BIGINT) AS n0, CAST(sum(c1) OVER () AS BIGINT) AS n1 FROM cnt), " +
        "g AS (SELECT v, n0, n1, abs(cum0 * n1 - cum1 * n0) AS gap FROM cum) " +
        "SELECT v AS v_at_max, n0, n1, (gap * 1000000) // (n0 * n1) AS d_ppm " +
        "FROM g ORDER BY gap DESC, v LIMIT 1"),
    "q_winsorize" ->
      ("WITH c AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events), " +
        "r AS (SELECT event_type, cents, CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS rn, " +
        "count(*) OVER (PARTITION BY event_type) AS n FROM c), " +
        "b AS (SELECT event_type, min(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END) AS lo, " +
        "min(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS hi FROM r GROUP BY event_type), " +
        "w AS (SELECT c.event_type, lo, hi, least(greatest(cents, lo), hi) AS wc FROM c JOIN b USING (event_type)), " +
        "g AS (SELECT event_type, count(*) AS n, min(lo) AS lo, min(hi) AS hi, " +
        "CAST(sum(wc) AS BIGINT) AS w_sum FROM w GROUP BY event_type) " +
        "SELECT event_type, n, lo, hi, " +
        "CAST(" + roundDivSql("w_sum", "n", 10000L) + " AS DOUBLE) / 10000.0 AS wmean " +
        "FROM g ORDER BY event_type"),
    "q_source_terms" ->
      (TP_TOK_CTE +
        ", tfa AS (SELECT source, token, count(*) AS tf_s FROM tok GROUP BY source, token)" +
        ", st AS (SELECT source, CAST(sum(tf_s) AS BIGINT) AS n_s FROM tfa GROUP BY source)" +
        ", tfs AS (SELECT * FROM tfa WHERE tf_s >= 5)" +
        ", corp AS (SELECT token, count(*) AS tf_c FROM tok GROUP BY token)" +
        ", tt AS (SELECT CAST(sum(tf_c) AS BIGINT) AS t_tot FROM corp)" +
        ", sc AS (SELECT tfs.source, tfs.token, tf_s, " +
        scaledDivSql("(tf_s * t_tot)", "(n_s * tf_c)", 100L, 100L) + " AS lift_e4 " +
        "FROM tfs JOIN st USING (source) JOIN corp USING (token) CROSS JOIN tt)" +
        ", r AS (SELECT source, token, tf_s, lift_e4, CAST(row_number() OVER " +
        "(PARTITION BY source ORDER BY lift_e4 DESC, token) AS BIGINT) AS rk FROM sc) " +
        "SELECT source, token, tf_s, lift_e4, rk FROM r WHERE rk <= 5 ORDER BY source, rk"),
    "q_token_gini" ->
      (TP_TOK_CTE +
        ", uni AS (SELECT token, count(*) AS c FROM tok GROUP BY token)" +
        ", r AS (SELECT c, CAST(row_number() OVER (ORDER BY c, token) AS BIGINT) AS rank FROM uni)" +
        ", fin AS (SELECT count(*) AS n_vocab, CAST(sum(c) AS BIGINT) AS total_tokens, " +
        "CAST(sum(rank * c) AS BIGINT) AS s1 FROM r) " +
        "SELECT n_vocab, total_tokens, " +
        ppmDivSql("(2 * s1 - (n_vocab + 1) * total_tokens)", "(n_vocab * total_tokens)") +
        " AS gini_ppm FROM fin"),
    "q_trigram_paths" ->
      ("WITH tr AS (SELECT user_id, event_type AS e1, " +
        "lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3 " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT e1, e2, e3, count(*) AS n, count(DISTINCT user_id) AS n_users " +
        "FROM tr WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY e1, e2, e3 " +
        "ORDER BY n DESC, e1, e2, e3 LIMIT 10"),
    "q_stickiness" ->
      ("WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day), " +
        "wau AS (SELECT d.day, count(DISTINCT a.user_id) AS wau FROM dau d " +
        "JOIN ud a ON a.day <= d.day AND a.day > d.day - INTERVAL 7 DAY GROUP BY d.day) " +
        "SELECT day, dau, wau, (dau * 1000) // wau AS stickiness_permille " +
        "FROM dau JOIN wau USING (day) ORDER BY day"),
    "q_rfm_cells" ->
      ("WITH u AS (SELECT user_id, " +
        "CAST(date_diff('day', DATE '1990-01-01', max(CAST(ts AS DATE))) AS BIGINT) AS r_days, " +
        "count(*) AS freq, CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY user_id), " +
        "r AS (SELECT cents, " +
        "CAST(row_number() OVER (ORDER BY r_days, user_id) AS BIGINT) AS rk_r, " +
        "CAST(row_number() OVER (ORDER BY freq, user_id) AS BIGINT) AS rk_f, " +
        "CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS rk_m, " +
        "count(*) OVER () AS n FROM u) " +
        "SELECT ((rk_r - 1) * 4) // n + 1 AS r_q, ((rk_f - 1) * 4) // n + 1 AS f_q, " +
        "((rk_m - 1) * 4) // n + 1 AS m_q, count(*) AS n_users, CAST(sum(cents) AS BIGINT) AS cents " +
        "FROM r GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q"),
    "q_ship_priority" ->
      ("WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'), " +
        "o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority " +
        "FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-06-01'), " +
        "l AS (SELECT l_orderkey, CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev " +
        "FROM lineitem WHERE CAST(l_shipdate AS DATE) > DATE '1998-06-01') " +
        "SELECT o_orderkey, o_orderdate, o_orderpriority, CAST(sum(rev) AS BIGINT) AS revenue_cp " +
        "FROM l JOIN o ON l_orderkey = o_orderkey JOIN c ON o_custkey = c_custkey " +
        "GROUP BY 1, 2, 3 ORDER BY revenue_cp DESC, o_orderdate, o_orderkey LIMIT 10"),
    "q_market_share" ->
      ("WITH ca AS (SELECT c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'), " +
        "sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier JOIN nation ON s_nationkey = n_nationkey), " +
        "l AS (SELECT l_orderkey, l_suppkey, CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev FROM lineitem) " +
        "SELECT o_year, total_cp, nation_cp, " + ppmDivSql("nation_cp", "total_cp") + " AS share_ppm " +
        "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, CAST(sum(rev) AS BIGINT) AS total_cp, " +
        "CAST(sum(CASE WHEN supp_nation = 'CHINA' THEN rev ELSE 0 END) AS BIGINT) AS nation_cp " +
        "FROM l JOIN orders ON l_orderkey = o_orderkey JOIN ca ON o_custkey = c_custkey " +
        "JOIN sn ON l_suppkey = s_suppkey GROUP BY 1) yr ORDER BY o_year"),
    "q_part_affinity" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "cnt AS (SELECT l_partkey, count(*) AS c1 FROM op GROUP BY l_partkey), " +
        "tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op), " +
        "pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS c_xy " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 5) " +
        "SELECT part_a, part_b, c_xy, (c_xy * n_orders * 10000) // (x.c1 * y.c1) AS lift_e4 " +
        "FROM pr JOIN cnt x ON pr.part_a = x.l_partkey JOIN cnt y ON pr.part_b = y.l_partkey CROSS JOIN tot " +
        "ORDER BY lift_e4 DESC, part_a, part_b LIMIT 20"),
    "q_auc_per_class" ->
      (SCORED_EMB_CTE +
        " SELECT class, n_pos, u_stat, " +
        ppmDivSql("u_stat", "(n_pos * (n_total - n_pos))") + " AS auc_ppm FROM " +
        "(SELECT label AS class, count(*) AS n_pos, " +
        "CAST(sum(rank) AS BIGINT) - (count(*) * (count(*) + 1)) // 2 AS u_stat " +
        "FROM r GROUP BY 1) g CROSS JOIN t ORDER BY class"),
    "q_calibration_bins" ->
      (SCORED_EMB_CTE +
        " SELECT decile, n, n_pos, " + ppmDivSql("n_pos", "n") + " AS pos_ppm, sum_score FROM " +
        "(SELECT ((rank - 1) * 10) // n_total + 1 AS decile, count(*) AS n, " +
        "CAST(sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, " +
        "CAST(sum(score) AS BIGINT) AS sum_score FROM r CROSS JOIN t GROUP BY 1) g " +
        "ORDER BY decile"),
    "q_changepoint" ->
      ("WITH daily AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x FROM orders GROUP BY 1, 2), " +
        "base AS (SELECT o_orderpriority, count(*) AS n_days, CAST(sum(x) AS BIGINT) AS total_cents FROM daily GROUP BY 1), " +
        "p AS (SELECT o_orderpriority, day, CAST(sum(x) OVER (PARTITION BY o_orderpriority ORDER BY day) AS BIGINT) AS p, " +
        "CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY day) AS BIGINT) AS k FROM daily), " +
        "dv AS (SELECT p.o_orderpriority, day, n_days, total_cents, " +
        "abs(n_days * p - k * total_cents) AS cusum_dev FROM p JOIN base USING (o_orderpriority)), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY cusum_dev DESC, day) AS rn FROM dv) " +
        "SELECT o_orderpriority, day, n_days, total_cents, cusum_dev FROM r WHERE rn = 1 " +
        "ORDER BY o_orderpriority"),
    "q_seasonal_anomaly" ->
      ("WITH ev AS (SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS BIGINT) AS hr FROM events), " +
        "hourly AS (SELECT day, hr, count(*) AS cnt FROM ev GROUP BY 1, 2), " +
        "dn AS (SELECT dayofweek(day) AS dow, count(*) AS n_dates FROM (SELECT DISTINCT day FROM ev) GROUP BY 1), " +
        "ct AS (SELECT dayofweek(day) AS dow, hr, CAST(sum(cnt) AS BIGINT) AS cell_total FROM hourly GROUP BY 1, 2) " +
        "SELECT day, h.hr AS hr, cnt, n_dates, cell_total, " +
        scaledDivSql("(cnt * n_dates)", "cell_total", 1000L, 1000L) + " AS ratio_ppm " +
        "FROM hourly h JOIN dn ON dayofweek(h.day) = dn.dow " +
        "JOIN ct ON dayofweek(h.day) = ct.dow AND h.hr = ct.hr " +
        "ORDER BY ratio_ppm DESC, day, hr LIMIT 20"),
    "q_fuzzy_match" ->
      ("WITH c AS (SELECT DISTINCT c_name AS name FROM customer) " +
        "SELECT a.name AS name_a, b.name AS name_b FROM c a JOIN c b " +
        "ON a.name < b.name AND levenshtein(a.name, b.name) = 1 " +
        "ORDER BY name_a, name_b"),
    "q_reagg_audit" ->
      ("WITH r AS (SELECT strftime(o_orderdate, '%Y-%m') AS ym, " +
        "strftime(o_orderdate, '%Y') || '-Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS qtr, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, " +
        "CAST('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT), strftime(o_orderdate, '%Y-%m-%d'), " +
        "o_orderpriority)), 1, 15) AS BIGINT) AS h FROM orders) " +
        "SELECT qtr, CAST(count(DISTINCT ym) AS BIGINT) AS n_months, count(*) AS n_rows, " +
        "CAST(sum(cents) AS BIGINT) AS total_cents, min(cents) AS min_cents, " +
        "max(cents) AS max_cents, CAST(bit_xor(h) AS BIGINT) AS checksum " +
        "FROM r GROUP BY qtr ORDER BY qtr"),
    "q_power_iteration" ->
      ("WITH v AS (SELECT list_transform(generate_series(1, 64), j -> " +
        "CAST((j * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5) AS v), " +
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), " +
        "z AS (SELECT vec_id, unnest(emb) AS val, unnest(v) AS vv, " +
        "CAST(generate_subscripts(emb, 1) AS BIGINT) AS pos FROM e CROSS JOIN v), " +
        "dot AS (SELECT vec_id, sum(val * vv) AS dot FROM z GROUP BY vec_id) " +
        "SELECT z.pos AS pos, round(sum(dot * val), 2) AS w " +
        "FROM z JOIN dot USING (vec_id) GROUP BY z.pos ORDER BY pos"),
    "q_zipf_profile" ->
      (TP_TOK_CTE +
        ", c AS (SELECT token, count(*) AS c FROM tok GROUP BY 1)" +
        ", r AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, token) AS BIGINT) AS rank FROM c)" +
        ", t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c)" +
        ", b AS (SELECT " +
        (0 to 40).reverse.map(b => s"WHEN rank >= ${1L << b} THEN $b")
          .mkString("CASE ", " ", " ELSE -1 END") +
        " AS rank_bucket, c FROM r) " +
        "SELECT CAST(rank_bucket AS BIGINT) AS rank_bucket, n_tokens, freq, " +
        ppmDivSql("freq", "total") + " AS freq_ppm FROM " +
        "(SELECT rank_bucket, count(*) AS n_tokens, CAST(sum(c) AS BIGINT) AS freq " +
        "FROM b GROUP BY 1) g CROSS JOIN t ORDER BY rank_bucket"),
    "q_table_checksum" ->
      ("WITH r AS (SELECT strftime(o_orderdate, '%Y-%m') AS ym, " +
        "CAST('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT), strftime(o_orderdate, '%Y-%m-%d'), " +
        "o_orderpriority)), 1, 15) AS BIGINT) AS h FROM orders) " +
        "SELECT ym, count(*) AS n_rows, CAST(bit_xor(h) AS BIGINT) AS checksum " +
        "FROM r GROUP BY ym ORDER BY ym"),
    "q_triangle_count" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "t AS (SELECT x.pa AS a, x.pb AS b, y.pb AS c FROM e x " +
        "JOIN e y ON x.pb = y.pa JOIN e z ON z.pa = x.pa AND z.pb = y.pb), " +
        "m AS (SELECT unnest([a, b, c]) AS l_partkey FROM t) " +
        "SELECT l_partkey, count(*) AS n_tri FROM m GROUP BY 1 " +
        "ORDER BY n_tri DESC, l_partkey LIMIT 20"),
    "q_simpson_diversity" ->
      (TP_TOK_CTE +
        ", c AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2)" +
        ", a AS (SELECT source, CAST(sum(c) AS BIGINT) AS t_tok, count(*) AS n_types, " +
        "CAST(sum(c * c) AS BIGINT) AS sum_c2 FROM c GROUP BY 1) " +
        "SELECT source, t_tok, n_types, sum_c2, " +
        "(" + scaledDivSql("sum_c2", "t_tok", 10L, 100000L) + ") // t_tok AS simpson_ppm, " +
        "(t_tok * t_tok) // sum_c2 AS eff_types FROM a ORDER BY source"),
    "q_ttr_profile" ->
      (TP_TOK_CTE +
        ", dc AS (SELECT doc_id, source, count(*) AS n_tok, " +
        "CAST(count(DISTINCT token) AS BIGINT) AS n_types FROM tok GROUP BY 1, 2)" +
        ", tt AS (SELECT source, (n_types * 1000000) // n_tok AS ttr_ppm FROM dc) " +
        "SELECT source, count(*) AS n_docs, min(ttr_ppm) AS min_ttr_ppm, " +
        "max(ttr_ppm) AS max_ttr_ppm, CAST(sum(ttr_ppm) AS BIGINT) // count(*) AS avg_ttr_ppm " +
        "FROM tt GROUP BY source ORDER BY source"),
    "q_small_qty_revenue" ->
      ("WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c FROM lineitem), " +
        "pa AS (SELECT l_partkey, count(*) AS cnt, CAST(sum(qty) AS BIGINT) AS sum_qty FROM li GROUP BY 1) " +
        "SELECT p_brand, count(*) AS n_small_lines, CAST(sum(price_c) AS BIGINT) AS loss_c " +
        "FROM li JOIN pa USING (l_partkey) JOIN part ON l_partkey = p_partkey " +
        "WHERE qty * 5 * cnt < sum_qty GROUP BY p_brand ORDER BY p_brand"),
    "q_top_supplier" ->
      ("WITH rev AS (SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_cp " +
        "FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01' " +
        "AND CAST(l_shipdate AS DATE) < DATE '1998-04-01' GROUP BY 1) " +
        "SELECT s_suppkey, s_name, revenue_cp FROM rev JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE revenue_cp = (SELECT max(revenue_cp) FROM rev) ORDER BY s_suppkey"),
    "q_large_orders" ->
      ("WITH big AS (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty " +
        "FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 280) " +
        "SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents, total_qty " +
        "FROM big JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY total_cents DESC, o_orderkey"),
    "q_vocab_overlap" ->
      (TP_TOK_CTE +
        ", st AS (SELECT DISTINCT source, token FROM tok)" +
        ", sz AS (SELECT source, count(*) AS n_tok FROM st GROUP BY source)" +
        ", i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common " +
        "FROM st a JOIN st b ON a.token = b.token AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT src_a, src_b, n_common, x.n_tok + y.n_tok - n_common AS n_union, " +
        "(n_common * 1000000) // (x.n_tok + y.n_tok - n_common) AS jaccard_ppm " +
        "FROM i JOIN sz x ON src_a = x.source JOIN sz y ON src_b = y.source " +
        "ORDER BY src_a, src_b"),
    "q_null_profile" ->
      ("WITH s AS (SELECT count(*) AS n_rows, " +
        Seq("event_id", "ts", "user_id", "event_type", "value", "props").map(c =>
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_n, " +
            s"count(DISTINCT $c) AS ${c}_d").mkString(", ") +
        " FROM events) " +
        Seq("event_id", "ts", "user_id", "event_type", "value", "props").map(c =>
          s"SELECT '$c' AS column_name, n_rows, ${c}_n AS n_null, ${c}_d AS n_distinct FROM s")
          .mkString(" UNION ALL ") +
        " ORDER BY column_name"),
    "q_lsh_precision" ->
      (SIG_CTE + ", allpairs AS (" +
        (1 to 4).map(i =>
          s"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.mh$i = b.mh$i AND a.doc_id < b.doc_id " +
            s"WHERE a.mh$i IN (SELECT mh$i FROM sig GROUP BY mh$i HAVING count(*) <= 1000)")
          .mkString(" UNION ") + ")" +
        // deterministic scale-adaptive thinning: keep-one-in-K by 60-bit
        // md5 prefix, K sized from the band-bucket histogram (identity
        // below the 100k budget)
        ", bs AS (" +
        (1 to 4).map(i =>
          s"SELECT count(*) AS n FROM sig GROUP BY mh$i HAVING count(*) BETWEEN 2 AND 1000")
          .mkString(" UNION ALL ") + ")" +
        ", np AS (SELECT greatest(1, (coalesce(sum((n * (n - 1)) // 2), 0) + 99999) // 100000) AS k FROM bs)" +
        ", pairs AS (SELECT id_a, id_b FROM allpairs, np " +
        "WHERE CAST('0x' || substr(md5(concat_ws('|', id_a, id_b)), 1, 15) AS BIGINT) " +
        "% k = 0)" +
        ", dist AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL)" +
        ", szs AS (SELECT doc_id, count(*) AS sz FROM dist GROUP BY doc_id)" +
        ", pm AS (SELECT p.id_a, p.id_b, CAST(" +
        (1 to 4).map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ") +
        " AS BIGINT) AS matches FROM pairs p JOIN sig a ON p.id_a = a.doc_id JOIN sig b ON p.id_b = b.doc_id)" +
        ", iv AS (SELECT p.id_a, p.id_b, count(*) AS inter FROM pairs p " +
        "JOIN dist x ON p.id_a = x.doc_id JOIN dist y ON p.id_b = y.doc_id AND x.shingle = y.shingle " +
        "GROUP BY 1, 2)" +
        ", j AS (SELECT pm.matches, coalesce(iv.inter, 0) AS inter, sa.sz AS sza, sb.sz AS szb " +
        "FROM pm LEFT JOIN iv ON pm.id_a = iv.id_a AND pm.id_b = iv.id_b " +
        "JOIN szs sa ON pm.id_a = sa.doc_id JOIN szs sb ON pm.id_b = sb.doc_id) " +
        "SELECT matches, count(*) AS n_pairs, " +
        "CAST(sum(CASE WHEN inter * 3 >= sza + szb THEN 1 ELSE 0 END) AS BIGINT) AS n_true, " +
        "(CAST(sum(CASE WHEN inter * 3 >= sza + szb THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*) AS precision_ppm " +
        "FROM j GROUP BY matches ORDER BY matches"),
    "q_user_growth" ->
      ("WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id), " +
        "d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day) " +
        "SELECT day, new_users, CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users " +
        "FROM d ORDER BY day"),
    "q_doc_novelty" ->
      (NORM_CTE +
        """, tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm)""" +
        """, sh AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))""" +
        ", dist AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL)" +
        ", fo AS (SELECT shingle, min(doc_id) AS first_doc FROM dist GROUP BY shingle) " +
        "SELECT doc_id, count(*) AS n_shingles, " +
        "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
        "(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) * 1000) // count(*) AS novelty_permille " +
        "FROM dist JOIN fo USING (shingle) GROUP BY doc_id ORDER BY doc_id"),
    "q_burstiness" ->
      ("WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hh, count(*) AS x FROM events GROUP BY 1, 2), " +
        "s AS (SELECT event_type, count(*) AS n_hours, CAST(sum(x) AS BIGINT) AS n_events, " +
        "CAST(sum(x * x) AS BIGINT) AS sxx FROM h GROUP BY event_type) " +
        "SELECT event_type, n_hours, n_events, " +
        "((n_hours * sxx - n_events * n_events) * 1000000) // (n_hours * n_events) AS fano_ppm " +
        "FROM s ORDER BY event_type"),
    "q_equi_height" ->
      ("WITH cents AS (SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem), " +
        "r AS (SELECT c, CAST(row_number() OVER (ORDER BY c) AS BIGINT) AS rank FROM cents), " +
        "t AS (SELECT count(*) AS n FROM cents), " +
        "b AS (SELECT CAST(i AS BIGINT) AS bucket, (CAST(i AS BIGINT) * n + 7) // 8 AS target " +
        "FROM generate_series(1, 8) AS g(i) CROSS JOIN t) " +
        "SELECT bucket, min(c) AS upper_cents, min(target) AS rank_at " +
        "FROM r JOIN b ON r.rank = b.target GROUP BY bucket ORDER BY bucket"),
    "q_conversion_time" ->
      ("WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id) " +
        "WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id) " +
        "WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id), " +
        "d AS (SELECT CAST(floor(epoch(s3.t3)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) AS secs " +
        "FROM s3 JOIN s1 USING (user_id)) " +
        "SELECT count(*) AS n_converted, " +
        "round(quantile_cont(CAST(secs AS DOUBLE), 0.25), 2) AS p25, " +
        "round(quantile_cont(CAST(secs AS DOUBLE), 0.5), 2) AS p50, " +
        "round(quantile_cont(CAST(secs AS DOUBLE), 0.9), 2) AS p90 FROM d"),
    "q_lsh_recall" ->
      ("""WITH norm AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)""" +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm)" +
        ", sh AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", dig AS (SELECT doc_id, md5(shingle) AS h FROM sh WHERE shingle IS NOT NULL)" +
        ", sig AS (SELECT doc_id, min(substr(h, 1, 8)) AS mh1, min(substr(h, 9, 8)) AS mh2, min(substr(h, 17, 8)) AS mh3, min(substr(h, 25, 8)) AS mh4 FROM dig GROUP BY doc_id)" +
        ", dist AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL)" +
        ", szs AS (SELECT doc_id, count(*) AS sz FROM dist GROUP BY doc_id)" +
        ", dft AS (SELECT shingle, count(*) AS df FROM dist GROUP BY shingle HAVING count(*) BETWEEN 2 AND 1000)" +
        // deterministic sample of the true-pair universe: keep-one-in-K by
        // 60-bit md5 prefix of the pair ids, K from the df histogram
        // (identity below the 100k budget); the SAME rule thins both sides
        ", np AS (SELECT greatest(1, (coalesce(sum((df * (df - 1)) // 2), 0) + 99999) // 100000) AS k FROM dft)" +
        ", iv AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter " +
        "FROM dist x JOIN dist y ON x.shingle = y.shingle AND x.doc_id < y.doc_id, np " +
        "WHERE x.shingle IN (SELECT shingle FROM dft) " +
        "AND CAST('0x' || substr(md5(concat_ws('|', x.doc_id, y.doc_id)), 1, 15) AS BIGINT) % k = 0 " +
        "GROUP BY 1, 2)" +
        ", tp AS (SELECT id_a, id_b FROM iv JOIN szs sa ON iv.id_a = sa.doc_id " +
        "JOIN szs sb ON iv.id_b = sb.doc_id WHERE inter * 3 >= sa.sz + sb.sz)" +
        ", candraw AS (" +
        (1 to 4).map(i =>
          s"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.mh$i = b.mh$i AND a.doc_id < b.doc_id " +
            s"WHERE a.mh$i IN (SELECT mh$i FROM sig GROUP BY mh$i HAVING count(*) <= 1000)")
          .mkString(" UNION ") + ")" +
        ", cand AS (SELECT id_a, id_b FROM candraw, np " +
        "WHERE CAST('0x' || substr(md5(concat_ws('|', id_a, id_b)), 1, 15) AS BIGINT) % k = 0) " +
        "SELECT count(*) AS n_true, " +
        "CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_captured, " +
        "CASE WHEN count(*) = 0 THEN 0 ELSE (CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*) END AS recall_ppm " +
        "FROM tp LEFT JOIN cand c ON tp.id_a = c.id_a AND tp.id_b = c.id_b"),
    "q_order_gaps" ->
      ("WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d2 FROM orders), " +
        "g AS (SELECT o_custkey, CAST(date_diff('day', lag(d2, 1) OVER " +
        "(PARTITION BY o_custkey ORDER BY d2, o_orderkey), d2) AS BIGINT) AS gap FROM o), " +
        "gg AS (SELECT c_mktsegment, gap FROM g JOIN customer ON o_custkey = c_custkey WHERE gap IS NOT NULL) " +
        "SELECT c_mktsegment, count(*) AS n_gaps, " +
        "round(quantile_cont(CAST(gap AS DOUBLE), 0.25), 2) AS p25, " +
        "round(quantile_cont(CAST(gap AS DOUBLE), 0.5), 2) AS p50, " +
        "round(quantile_cont(CAST(gap AS DOUBLE), 0.9), 2) AS p90 " +
        "FROM gg GROUP BY 1 ORDER BY 1"),
    "q_dup_degree" ->
      (SIG_CTE + ", pairs AS (" +
        (1 to 4).map(i =>
          s"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.mh$i = b.mh$i AND a.doc_id < b.doc_id " +
            s"WHERE a.mh$i IN (SELECT mh$i FROM sig GROUP BY mh$i HAVING count(*) BETWEEN 2 AND 1000)")
          .mkString(" UNION ") + ")" +
        ", deg AS (SELECT doc_id, count(*) AS degree FROM (" +
        "SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b FROM pairs) u GROUP BY doc_id) " +
        "SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree ORDER BY degree"),
    "q_len_profile" ->
      (NORM_CTE +
        ", tk AS (SELECT lang, CAST(len(list_filter(string_split(t, ' '), x -> x <> '')) AS BIGINT) AS n FROM norm)" +
        ", b AS (SELECT lang, n, CASE " +
        (11 to 0 by -1).map(i => s"WHEN n >= ${1L << i} THEN $i").mkString(" ") +
        " ELSE -1 END AS len_bucket FROM tk WHERE n > 0) " +
        "SELECT lang, CAST(len_bucket AS BIGINT) AS len_bucket, count(*) AS n_docs, " +
        "CAST(sum(n) AS BIGINT) AS total_tokens " +
        "FROM b GROUP BY lang, len_bucket ORDER BY lang, len_bucket"),
    "q_tvd_drift" ->
      ("WITH c AS (SELECT event_type, " +
        "CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS c1, " +
        "CAST(sum(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END) AS BIGINT) AS c2 " +
        "FROM events GROUP BY event_type), " +
        "t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c), " +
        "g AS (SELECT event_type, c1, c2, abs(c1 * n2 - c2 * n1) AS gap, n1, n2 FROM c CROSS JOIN t), " +
        "g2 AS (SELECT event_type, c1, c2, gap, CAST(sum(gap) OVER () AS BIGINT) AS gap_sum, n1, n2 FROM g) " +
        "SELECT event_type, c1, c2, gap, " +
        "CAST(" + ppmDivSql("gap_sum", "(2 * n1 * n2)") + " AS BIGINT) AS tvd_ppm " +
        "FROM g2 ORDER BY event_type"),
    "q_window_dedup" ->
      ("WITH b AS (SELECT event_id, user_id, event_type, ts, " +
        "CAST(floor(epoch(ts)) AS BIGINT) // 300 AS wb FROM events), " +
        "r AS (SELECT event_type, row_number() OVER " +
        "(PARTITION BY user_id, event_type, wb ORDER BY ts, event_id) AS rn FROM b) " +
        "SELECT event_type, count(*) AS n_events, " +
        "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "((count(*) - CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)) * 1000) // count(*) AS drop_permille " +
        "FROM r GROUP BY event_type ORDER BY event_type"),
    "q_pareto" ->
      ("WITH c AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM orders GROUP BY 1), " +
        "r AS (SELECT o_custkey, cents, CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS rank FROM c), " +
        "t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents, count(*) AS n_customers FROM c), " +
        "cum AS (SELECT rank, CAST(sum(cents) OVER (ORDER BY rank) AS BIGINT) AS cum FROM r) " +
        "SELECT rank AS top_customers, n_customers, " +
        ppmDivSql("cum", "total_cents") + " AS share_ppm, " +
        "(rank * 1000000) // n_customers AS pct_customers_ppm " +
        "FROM cum CROSS JOIN t WHERE cum * 5 >= total_cents * 4 ORDER BY rank LIMIT 1"),
    "q_clamped_balance" ->
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN event_type IN ('signup', 'purchase') " +
        "THEN CAST(round(value * 100, 0) AS BIGINT) " +
        "ELSE -CAST(round(value * 100, 0) AS BIGINT) END AS delta FROM events), " +
        "p AS (SELECT user_id, event_id, ts, delta, CAST(sum(delta) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pref FROM e), " +
        "m AS (SELECT user_id, event_id, delta, pref, min(pref) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin FROM p) " +
        "SELECT user_id, event_id, delta, pref - least(0, runmin) AS balance " +
        "FROM m ORDER BY user_id, event_id"),
    "q_ewma_decay" ->
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events) " +
        "SELECT user_id, event_id, cents, " +
        (0 to 7).map(k =>
          s"coalesce(lag(cents, $k) OVER w, 0) * ${1L << (7 - k)}")
          .mkString(" + ") + " AS ewma_q8 " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY user_id, event_id"),
    "q_rolling_corr" ->
      ("WITH daily AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day, " +
        "CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT) AS x, " +
        "count(*) AS y FROM orders GROUP BY 1, 2), " +
        "s AS (SELECT o_orderpriority, day, " +
        "CAST(count(*) OVER w AS BIGINT) AS n, " +
        "CAST(sum(x) OVER w AS BIGINT) AS sx, CAST(sum(y) OVER w AS BIGINT) AS sy, " +
        "CAST(sum(x * x) OVER w AS BIGINT) AS sxx, " +
        "CAST(sum(x * y) OVER w AS BIGINT) AS sxy, " +
        "CAST(sum(y * y) OVER w AS BIGINT) AS syy " +
        "FROM daily WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day " +
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)), " +
        "m AS (SELECT o_orderpriority, day, n, " +
        "n * sxy - sx * sy AS num, n * sxx - sx * sx AS d1, " +
        "n * syy - sy * sy AS d2 FROM s) " +
        "SELECT o_orderpriority, day, n, num, d1, d2, " +
        "CASE WHEN d1 = 0 OR d2 = 0 THEN NULL " +
        "WHEN num < 0 THEN -round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) / " +
        "(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)), 6) " +
        "ELSE round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) / " +
        "(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)), 6) END AS signed_r2 " +
        "FROM m ORDER BY o_orderpriority, day"),
    "q_pagerank_step" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "sym AS (SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e), " +
        "d AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1), " +
        "c AS (SELECT dst, 1000000 // deg AS contrib FROM sym JOIN d USING (src)) " +
        "SELECT dst AS l_partkey, 150000 + (85 * CAST(sum(contrib) AS BIGINT)) // 100 AS rank_ppm " +
        "FROM c GROUP BY dst ORDER BY rank_ppm DESC, l_partkey LIMIT 20"),
    "q_label_prop" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "sym AS (SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e), " +
        "v AS (SELECT dst, p_brand AS nlabel, count(*) AS votes " +
        "FROM sym JOIN part ON src = p_partkey GROUP BY 1, 2), " +
        "r AS (SELECT dst, nlabel, votes, row_number() OVER " +
        "(PARTITION BY dst ORDER BY votes DESC, nlabel) AS rn FROM v) " +
        "SELECT dst AS l_partkey, p_brand AS old_label, nlabel AS new_label, votes, " +
        "CAST(CASE WHEN p_brand = nlabel THEN 0 ELSE 1 END AS BIGINT) AS changed " +
        "FROM r JOIN part ON dst = p_partkey WHERE rn = 1 ORDER BY l_partkey"),
    "q_inverted_index" ->
      (TP_TOK_CTE +
        ", tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2), " +
        "r AS (SELECT token, doc_id, tf, " +
        "CAST(row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS BIGINT) AS pos, " +
        "CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS posting_len FROM tf) " +
        "SELECT token, doc_id, tf, pos, posting_len FROM r WHERE pos <= 5 " +
        "ORDER BY token, pos"),
    "q_heavy_hitters" ->
      (TP_TOK_CTE +
        ", t AS (SELECT count(*) AS n FROM tok), " +
        "c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1) " +
        "SELECT token, cnt, n AS total, " + ppmDivSql("cnt", "n") + " AS share_ppm " +
        "FROM c CROSS JOIN t WHERE cnt * 200 >= n ORDER BY cnt DESC, token"),
    "q_graph_components" ->
      ("WITH RECURSIVE " +
        "op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "sym AS (SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e), " +
        "r(node, reach) AS (SELECT src, src FROM (SELECT DISTINCT src FROM sym) " +
        "UNION SELECT r.node, s.dst FROM r JOIN sym s ON r.reach = s.src), " +
        "cc AS (SELECT node, min(reach) AS component FROM r GROUP BY node), " +
        "sz AS (SELECT component, count(*) AS csize FROM cc GROUP BY 1) " +
        "SELECT node AS l_partkey, component, csize FROM cc JOIN sz USING (component) " +
        "ORDER BY l_partkey"),
    "q_fk_audit" ->
      ("WITH rels AS (" +
        "SELECT 'orders->customer' AS relation, count(*) AS n_child, " +
        "CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan " +
        "FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p ON o_custkey = c_custkey " +
        "UNION ALL SELECT 'lineitem->orders', count(*), " +
        "CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p ON l_orderkey = o_orderkey " +
        "UNION ALL SELECT 'lineitem->part', count(*), " +
        "CAST(sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p ON l_partkey = p_partkey " +
        "UNION ALL SELECT 'lineitem->supplier', count(*), " +
        "CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) p ON l_suppkey = s_suppkey " +
        "UNION ALL SELECT 'customer->nation', count(*), " +
        "CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) p ON c_nationkey = n_nationkey " +
        "UNION ALL SELECT 'supplier->nation', count(*), " +
        "CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "FROM supplier LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) p ON s_nationkey = n_nationkey) " +
        "SELECT relation, n_child, n_orphan, " + ppmDivSql("n_orphan", "n_child") +
        " AS orphan_ppm FROM rels ORDER BY relation"),
    "q_skew_profile" ->
      ("WITH c AS (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1), " +
        "b AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows, " +
        "max(cnt) AS max_cnt FROM c) " +
        "SELECT l_orderkey, cnt, n_keys, n_rows, " +
        ppmDivSql("cnt", "n_rows") + " AS share_ppm, " +
        "(max_cnt * n_keys * 1000000) // n_rows AS skew_factor_ppm " +
        "FROM c CROSS JOIN b ORDER BY cnt DESC, l_orderkey LIMIT 20"),
    "q_ndv_stats" ->
      ("WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd_l_orderkey, CAST(count(*) - count(l_orderkey) AS BIGINT) AS nn_l_orderkey, CAST(min(l_orderkey) AS VARCHAR) AS mn_l_orderkey, CAST(max(l_orderkey) AS VARCHAR) AS mx_l_orderkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_l_partkey, CAST(count(*) - count(l_partkey) AS BIGINT) AS nn_l_partkey, CAST(min(l_partkey) AS VARCHAR) AS mn_l_partkey, CAST(max(l_partkey) AS VARCHAR) AS mx_l_partkey, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_l_suppkey, CAST(count(*) - count(l_suppkey) AS BIGINT) AS nn_l_suppkey, CAST(min(l_suppkey) AS VARCHAR) AS mn_l_suppkey, CAST(max(l_suppkey) AS VARCHAR) AS mx_l_suppkey, CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nd_l_returnflag, CAST(count(*) - count(l_returnflag) AS BIGINT) AS nn_l_returnflag, CAST(min(l_returnflag) AS VARCHAR) AS mn_l_returnflag, CAST(max(l_returnflag) AS VARCHAR) AS mx_l_returnflag, CAST(count(DISTINCT l_linestatus) AS BIGINT) AS nd_l_linestatus, CAST(count(*) - count(l_linestatus) AS BIGINT) AS nn_l_linestatus, CAST(min(l_linestatus) AS VARCHAR) AS mn_l_linestatus, CAST(max(l_linestatus) AS VARCHAR) AS mx_l_linestatus, CAST(count(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT) AS nd_l_shipdate, CAST(count(*) - count(CAST(l_shipdate AS DATE)) AS BIGINT) AS nn_l_shipdate, CAST(min(CAST(l_shipdate AS DATE)) AS VARCHAR) AS mn_l_shipdate, CAST(max(CAST(l_shipdate AS DATE)) AS VARCHAR) AS mx_l_shipdate FROM lineitem) SELECT * FROM (SELECT 'l_orderkey' AS col, n_rows, nn_l_orderkey AS n_nulls, nd_l_orderkey AS ndv, mn_l_orderkey AS min_val, mx_l_orderkey AS max_val FROM a UNION ALL SELECT 'l_partkey' AS col, n_rows, nn_l_partkey AS n_nulls, nd_l_partkey AS ndv, mn_l_partkey AS min_val, mx_l_partkey AS max_val FROM a UNION ALL SELECT 'l_suppkey' AS col, n_rows, nn_l_suppkey AS n_nulls, nd_l_suppkey AS ndv, mn_l_suppkey AS min_val, mx_l_suppkey AS max_val FROM a UNION ALL SELECT 'l_returnflag' AS col, n_rows, nn_l_returnflag AS n_nulls, nd_l_returnflag AS ndv, mn_l_returnflag AS min_val, mx_l_returnflag AS max_val FROM a UNION ALL SELECT 'l_linestatus' AS col, n_rows, nn_l_linestatus AS n_nulls, nd_l_linestatus AS ndv, mn_l_linestatus AS min_val, mx_l_linestatus AS max_val FROM a UNION ALL SELECT 'l_shipdate' AS col, n_rows, nn_l_shipdate AS n_nulls, nd_l_shipdate AS ndv, mn_l_shipdate AS min_val, mx_l_shipdate AS max_val FROM a) ORDER BY col"),
    "q_dataset_card" ->
      (TP_TOK_CTE +
        ", ds AS (SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = '' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_empty, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM documents GROUP BY 1), " +
        "tt AS (SELECT source, shingle_token AS token, count(*) AS c FROM " +
        "(SELECT source, token AS shingle_token FROM tok) GROUP BY 1, 2), " +
        "ts AS (SELECT source, CAST(sum(c) AS BIGINT) AS total_tokens, " +
        "count(*) AS n_types FROM tt GROUP BY 1) " +
        "SELECT ds.source AS source, n_docs, n_empty, n_langs, " +
        "coalesce(total_tokens, 0) AS total_tokens, " +
        "coalesce(n_types, 0) AS n_types, " +
        ppmDivSql("coalesce(total_tokens, 0)", "n_docs") + " AS mean_len_ppm " +
        "FROM ds LEFT JOIN ts ON ds.source = ts.source ORDER BY source"),
    "q_bfs_levels" ->
      ("WITH RECURSIVE " +
        "op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "sym AS (SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e), " +
        "dg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1), " +
        "seedq AS (SELECT src FROM dg ORDER BY deg DESC, src LIMIT 1), " +
        "r(node, dd) AS (SELECT src, CAST(0 AS BIGINT) FROM seedq " +
        "UNION SELECT s.dst, r.dd + 1 FROM r JOIN sym s ON r.node = s.src WHERE r.dd < 15) " +
        "SELECT node AS l_partkey, CAST(min(dd) AS BIGINT) AS level FROM r " +
        "GROUP BY node ORDER BY l_partkey"),
    "q_abtest_chi2" ->
      ("WITH u AS (SELECT user_id, " +
        "CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14 " +
        "THEN 1 ELSE 0 END AS converted " +
        "FROM events GROUP BY 1), " +
        "arms AS (SELECT ((user_id % 2147483648) * 2654435761) % 4294967296 % 2 AS arm, " +
        "converted FROM u), " +
        "cells AS (SELECT " +
        "CAST(sum(CASE WHEN arm = 0 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN arm = 1 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM arms) " +
        "SELECT a, b, c, d, " +
        ppmDivSql("b", "(a + b)") + " AS rate0_ppm, " +
        ppmDivSql("d", "(c + d)") + " AS rate1_ppm, " +
        "CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0 THEN NULL " +
        "ELSE round(((a + b + c + d) * pow(CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c, 2)) / " +
        "((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d) * " +
        "(CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)), 4) END AS chi2 " +
        "FROM cells"),
    "q_prefix_dup" ->
      ("WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents), " +
        "f AS (SELECT doc_id, md5(array_to_string(list_slice(string_split(t, ' '), 1, 16), ' ')) AS pfp " +
        "FROM n WHERE t <> ''), " +
        "g AS (SELECT doc_id, pfp, min(doc_id) OVER (PARTITION BY pfp) AS canonical_id, " +
        "CAST(count(*) OVER (PARTITION BY pfp) AS BIGINT) AS grp_size FROM f) " +
        "SELECT doc_id, canonical_id, grp_size FROM g WHERE grp_size >= 2 ORDER BY doc_id"),
    "q_containment" ->
      ("WITH d0 AS (SELECT * FROM documents WHERE doc_id % 50 = 0), " +
        "n AS (SELECT doc_id, lang, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM d0), " +
        "tok AS (SELECT DISTINCT doc_id, lang, unnest(string_split(t, ' ')) AS token FROM n WHERE t <> ''), " +
        "sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY 1), " +
        "dft AS (SELECT lang, token FROM (SELECT lang, token, count(*) AS df FROM tok GROUP BY 1, 2) " +
        "WHERE df BETWEEN 2 AND 1000), " +
        "inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS c " +
        "FROM tok x JOIN dft USING (lang, token) JOIN tok y " +
        "ON x.lang = y.lang AND x.token = y.token AND x.doc_id < y.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT id_a, id_b, c, na, nb, " + ppmDivSql("c", "least(na, nb)") + " AS containment_ppm " +
        "FROM inter JOIN (SELECT doc_id AS id_a, sz AS na FROM sz) USING (id_a) " +
        "JOIN (SELECT doc_id AS id_b, sz AS nb FROM sz) USING (id_b) " +
        "WHERE na <> nb AND " + ppmDivSql("c", "least(na, nb)") + " >= 600000 " +
        "ORDER BY id_a, id_b"),
    "q_mann_kendall" ->
      ("WITH m AS (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS ym, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x " +
        "FROM orders GROUP BY 1, 2) " +
        "SELECT i.o_orderpriority AS o_orderpriority, " +
        "CAST(sum(CAST(sign(j.x - i.x) AS BIGINT)) AS BIGINT) AS s_stat, " +
        "CAST(sum(CASE WHEN j.x > i.x THEN 1 ELSE 0 END) AS BIGINT) AS concordant, " +
        "CAST(sum(CASE WHEN j.x < i.x THEN 1 ELSE 0 END) AS BIGINT) AS discordant, " +
        "CAST(sum(CASE WHEN j.x = i.x THEN 1 ELSE 0 END) AS BIGINT) AS ties, " +
        "count(*) AS n_pairs " +
        "FROM m i JOIN m j ON i.o_orderpriority = j.o_orderpriority AND i.ym < j.ym " +
        "GROUP BY 1 ORDER BY 1"),
    "q_incremental_dedup" ->
      ("""WITH fp AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f FROM documents), """ +
        "corpus AS (SELECT f, min(doc_id) AS corpus_canonical FROM fp WHERE doc_id % 2 = 0 GROUP BY 1), " +
        "batch AS (SELECT doc_id, f, min(doc_id) OVER (PARTITION BY f) AS batch_first " +
        "FROM fp WHERE doc_id % 2 = 1) " +
        "SELECT doc_id, corpus_canonical, " +
        "CAST(CASE WHEN corpus_canonical IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS dup_of_corpus, " +
        "CAST(CASE WHEN doc_id <> batch_first THEN 1 ELSE 0 END AS BIGINT) AS dup_in_batch " +
        "FROM batch LEFT JOIN corpus USING (f) ORDER BY doc_id"),
    "q_locf_impute" ->
      ("SELECT user_id, event_id, event_type, " +
        "last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value " +
        "FROM events ORDER BY user_id, event_id"),
    "q_regional_revenue" ->
      ("WITH an AS (SELECT n_nationkey, n_name FROM nation JOIN region " +
        "ON n_regionkey = r_regionkey WHERE r_name = 'ASIA') " +
        "SELECT n_name, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_cp, " +
        "count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey " +
        "JOIN an ON c_nationkey = an.n_nationkey " +
        "WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01' " +
        "GROUP BY n_name ORDER BY n_name"),
    "q_returned_customers" ->
      ("SELECT c_custkey, c_name, n_name, " +
        "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_cp " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' AND o_orderdate >= DATE '1997-01-01' " +
        "AND o_orderdate < DATE '1997-07-01' " +
        "GROUP BY 1, 2, 3 ORDER BY revenue_cp DESC, c_custkey LIMIT 20"),
    "q_promo_share" ->
      ("WITH r AS (SELECT " +
        "CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) ELSE 0 END) AS BIGINT) AS promo_cp, " +
        "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS total_cp " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01') " +
        "SELECT promo_cp, total_cp, " + ppmDivSql("promo_cp", "total_cp") +
        " AS promo_share_ppm FROM r"),
    "q_funnel_bounded" ->
      ("WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id) " +
        "WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 604800 SECOND " +
        "GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id) " +
        "WHERE event_type = 'purchase' AND ts > t2 AND ts <= t2 + INTERVAL 604800 SECOND " +
        "GROUP BY e.user_id) " +
        "SELECT (SELECT count(*) FROM s1) AS n_view, " +
        "(SELECT count(*) FROM s2) AS n_click_7d, " +
        "(SELECT count(*) FROM s3) AS n_purchase_7d"),
    "q_discovery_curve" ->
      ("WITH f AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first FROM events) " +
        "SELECT user_id, event_id, CAST(sum(is_first) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS types_seen " +
        "FROM f ORDER BY user_id, event_id"),
    "q_zone_map" ->
      ("WITH b AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, " +
        "CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 500) AS BIGINT) + 1 AS batch_id " +
        "FROM orders) " +
        "SELECT batch_id, count(*) AS n_rows, min(o_orderkey) AS min_key, " +
        "max(o_orderkey) AS max_key, min(day) AS min_day, max(day) AS max_day, " +
        "min(cents) AS min_cents, max(cents) AS max_cents " +
        "FROM b GROUP BY 1 ORDER BY 1"),
    "q_balanced_sample" ->
      ("WITH ev AS (SELECT event_type, event_id, " +
        "((event_id % 2147483648) * 2654435761) % 4294967296 AS h FROM events), " +
        "cap AS (SELECT CAST(min(n) AS BIGINT) AS cap FROM " +
        "(SELECT event_type, count(*) AS n FROM ev GROUP BY 1)), " +
        "r AS (SELECT event_type, h, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY h, event_id) AS rk FROM ev) " +
        "SELECT event_type, count(*) AS kept, min(cap) AS cap, " +
        "CAST(sum(h) AS BIGINT) AS h_sum " +
        "FROM r CROSS JOIN cap WHERE rk <= cap GROUP BY 1 ORDER BY 1"),
    "q_dedup_report" ->
      ("""WITH fp AS (SELECT source, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f FROM documents), """ +
        "g AS (SELECT source, f, count(*) AS c FROM fp GROUP BY 1, 2), " +
        "r AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_unique, " +
        "CAST(sum(c) - count(*) AS BIGINT) AS n_dups FROM g GROUP BY 1) " +
        "SELECT source, n_docs, n_unique, n_dups, " + ppmDivSql("n_dups", "n_docs") +
        " AS dup_ppm FROM r ORDER BY source"),
    "q_theil_sen" ->
      ("WITH m AS (SELECT o_orderpriority, " +
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x " +
        "FROM orders GROUP BY 1, 2), " +
        "sl AS (SELECT i.o_orderpriority, " +
        scaledDivSql("(j.x - i.x)", "(j.m - i.m)", 1000L, 1000L) + " AS slope " +
        "FROM m i JOIN m j ON i.o_orderpriority = j.o_orderpriority AND i.m < j.m), " +
        "r AS (SELECT o_orderpriority, slope, " +
        "CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY slope, o_orderpriority) AS BIGINT) AS rk, " +
        "CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n FROM sl) " +
        "SELECT o_orderpriority, slope AS theil_sen_slope, n AS n_pairs, rk AS median_rank " +
        "FROM r WHERE rk = (n + 1) // 2 ORDER BY o_orderpriority"),
    "q_autocorr" ->
      ("WITH m AS (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS ym, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) // 10000 AS x " +
        "FROM orders GROUP BY 1, 2), " +
        "l AS (SELECT o_orderpriority, x, lag(x) OVER " +
        "(PARTITION BY o_orderpriority ORDER BY ym) AS xp FROM m), " +
        "a AS (SELECT o_orderpriority, count(*) AS n, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(xp) AS BIGINT) AS sy, " +
        "CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(xp * xp) AS BIGINT) AS syy, " +
        "CAST(sum(x * xp) AS BIGINT) AS sxy FROM l WHERE xp IS NOT NULL GROUP BY 1) " +
        "SELECT o_orderpriority, n, n * sxy - sx * sy AS num, " +
        "n * sxx - sx * sx AS d1, n * syy - sy * sy AS d2, " +
        "CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL " +
        "ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)) / " +
        "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r1 " +
        "FROM a ORDER BY o_orderpriority"),
    "q_runs_test" ->
      ("WITH m AS (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS ym, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x " +
        "FROM orders GROUP BY 1, 2), " +
        "r AS (SELECT o_orderpriority, ym, x, " +
        "CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY x, ym) AS BIGINT) AS rk, " +
        "CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n FROM m), " +
        "md AS (SELECT o_orderpriority, x AS median_x FROM r WHERE rk = (n + 1) // 2), " +
        "sd AS (SELECT m.o_orderpriority, ym, " +
        "CASE WHEN x > median_x THEN 1 ELSE 0 END AS side FROM m JOIN md USING (o_orderpriority)), " +
        "lg AS (SELECT o_orderpriority, side, lag(side) OVER " +
        "(PARTITION BY o_orderpriority ORDER BY ym) AS prev FROM sd) " +
        "SELECT o_orderpriority, count(*) AS n_months, " +
        "CAST(sum(side) AS BIGINT) AS n_above, " +
        "CAST(sum(CASE WHEN prev IS NOT NULL AND side <> prev THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs " +
        "FROM lg GROUP BY 1 ORDER BY 1"),
    "q_revenue_bridge" ->
      ("WITH cm AS (SELECT o_custkey, CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM orders GROUP BY 1, 2), " +
        "e AS (SELECT o_custkey, m, cents, " +
        "lag(m) OVER w AS pm, lag(cents) OVER w AS pc, lead(m) OVER w AS nm " +
        "FROM cm WINDOW w AS (PARTITION BY o_custkey ORDER BY m)), " +
        "inflow AS (SELECT m, CAST(sum(cents) AS BIGINT) AS total_cents, " +
        "CAST(sum(CASE WHEN pm IS NULL THEN cents ELSE 0 END) AS BIGINT) AS new_cents, " +
        "CAST(sum(CASE WHEN pm IS NOT NULL AND pm < m - 1 THEN cents ELSE 0 END) AS BIGINT) AS react_cents, " +
        "CAST(sum(CASE WHEN pm = m - 1 AND cents > pc THEN cents - pc ELSE 0 END) AS BIGINT) AS expansion_cents, " +
        "CAST(sum(CASE WHEN pm = m - 1 AND cents < pc THEN pc - cents ELSE 0 END) AS BIGINT) AS contraction_cents " +
        "FROM e GROUP BY 1), " +
        "churn AS (SELECT m + 1 AS m, CAST(sum(cents) AS BIGINT) AS churn_cents " +
        "FROM e WHERE nm IS NULL OR nm <> m + 1 GROUP BY 1) " +
        "SELECT m, total_cents, new_cents, react_cents, expansion_cents, " +
        "contraction_cents, coalesce(churn_cents, 0) AS churn_cents " +
        "FROM inflow LEFT JOIN churn USING (m) ORDER BY m"),
    "q_ab_quantiles" ->
      ("WITH a AS (SELECT ((o_custkey % 2147483648) * 2654435761) % 4294967296 % 2 AS arm, " +
        "CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) AS v FROM orders) " +
        "SELECT arm, round(quantile_cont(v, 0.25), 2) AS p25_c, " +
        "round(quantile_cont(v, 0.5), 2) AS p50_c, " +
        "round(quantile_cont(v, 0.75), 2) AS p75_c " +
        "FROM a GROUP BY arm ORDER BY arm"),
    "q_session_lengths" ->
      ("WITH o AS (SELECT user_id, ts, lag(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM events), " +
        // session_window is half-open: an event exactly 24h after the
        // previous one starts a NEW session → the islands break is `>=`
        "f AS (SELECT user_id, ts, CASE WHEN pts IS NULL OR " +
        "ts >= pts + INTERVAL 24 HOUR THEN 1 ELSE 0 END AS brk FROM o), " +
        "sid AS (SELECT user_id, ts, CAST(sum(brk) OVER " +
        "(PARTITION BY user_id ORDER BY ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess FROM f), " +
        "sp AS (SELECT (epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000 AS mins " +
        "FROM sid GROUP BY user_id, sess), " +
        "b AS (SELECT " +
        (0 to 20).reverse.map(b => s"WHEN mins >= ${1L << b} THEN $b")
          .mkString("CASE ", " ", " ELSE -1 END") +
        " AS len_bucket FROM sp) " +
        "SELECT CAST(len_bucket AS BIGINT) AS len_bucket, count(*) AS n_sessions " +
        "FROM b GROUP BY 1 ORDER BY 1"),
    "q_rolling_median" ->
      ("WITH daily AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x " +
        "FROM orders GROUP BY 1, 2), " +
        "f AS (SELECT o_orderpriority, day, list_sort(list(x) OVER " +
        "(PARTITION BY o_orderpriority ORDER BY day " +
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr FROM daily) " +
        "SELECT o_orderpriority, day, CAST(len(arr) AS BIGINT) AS n, " +
        "arr[(len(arr) + 1) // 2] AS med_cents " +
        "FROM f ORDER BY o_orderpriority, day"),
    "q_benford" ->
      ("WITH d AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) " +
        "AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders), " +
        "d1 AS (SELECT digit FROM d WHERE digit >= 1), " +
        "t AS (SELECT count(*) AS n_total FROM d1) " +
        "SELECT digit, count(*) AS cnt, n_total, " +
        ppmDivSql("count(*)", "n_total") + " AS share_ppm " +
        "FROM d1 CROSS JOIN t GROUP BY digit, n_total ORDER BY digit"),
    "q_cohort_ltv" ->
      ("WITH om AS (SELECT o_custkey, CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders), " +
        "c AS (SELECT o_custkey, min(m) AS c0 FROM om GROUP BY 1), " +
        "g AS (SELECT c0, m - c0 AS \"offset\", CAST(sum(cents) AS BIGINT) AS cents, " +
        "CAST(count(DISTINCT om.o_custkey) AS BIGINT) AS n_cust " +
        "FROM om JOIN c USING (o_custkey) GROUP BY 1, 2) " +
        "SELECT c0 AS cohort_m, \"offset\", n_cust, cents, " +
        "CAST(sum(cents) OVER (PARTITION BY c0 ORDER BY \"offset\" " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents " +
        "FROM g ORDER BY cohort_m, \"offset\""),
    "q_weighted_median" ->
      ("WITH vw AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents, " +
        "CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS wt " +
        "FROM lineitem GROUP BY 1, 2), " +
        "c AS (SELECT l_returnflag, cents, " +
        "CAST(sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
        "CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS wtot FROM vw) " +
        "SELECT l_returnflag, min(cents) AS wmed_cents, min(wtot) AS w_total " +
        "FROM c WHERE cum * 2 >= wtot GROUP BY 1 ORDER BY 1"),
    "q_trimmed_mean" ->
      ("WITH vc AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents, " +
        "count(*) AS wt FROM lineitem GROUP BY 1, 2), " +
        "c AS (SELECT l_returnflag, cents, wt, " +
        "CAST(sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
        "CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n FROM vc), " +
        "k AS (SELECT l_returnflag, cents, n, n // 10 AS lo, n - n // 10 AS hi, " +
        "greatest(0, least(cum, n - n // 10) - greatest(cum - wt, n // 10)) AS kept FROM c), " +
        "g AS (SELECT l_returnflag, min(n) AS n_rows, min(hi - lo) AS n_kept, " +
        "CAST(sum(cents * kept) AS BIGINT) AS trimmed_sum FROM k GROUP BY 1) " +
        "SELECT l_returnflag, n_rows, n_kept, trimmed_sum, " +
        "CAST(" + roundDivSql("trimmed_sum", "n_kept", 10000L) + " AS DOUBLE) / 10000.0 AS trimmed_mean " +
        "FROM g ORDER BY 1"),
    "q_mode_stat" ->
      ("WITH vc AS (SELECT l_returnflag, CAST(round(l_quantity, 0) AS BIGINT) AS qty, " +
        "count(*) AS freq FROM lineitem GROUP BY 1, 2), " +
        "r AS (SELECT l_returnflag, qty, freq, row_number() OVER " +
        "(PARTITION BY l_returnflag ORDER BY freq DESC, qty) AS rn FROM vc) " +
        "SELECT l_returnflag, qty AS mode_qty, freq FROM r WHERE rn = 1 ORDER BY 1"),
    "q_iqr_outliers" ->
      ("WITH vc AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents, " +
        "count(*) AS wt FROM lineitem GROUP BY 1, 2), " +
        "c AS (SELECT l_returnflag, cents, wt, " +
        "CAST(sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
        "CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n FROM vc), " +
        "f AS (SELECT l_returnflag, min(CASE WHEN cum * 4 >= n THEN cents END) AS q1, " +
        "min(CASE WHEN cum * 4 >= n * 3 THEN cents END) AS q3, min(n) AS n FROM c GROUP BY 1), " +
        "f2 AS (SELECT l_returnflag, q1, q3, n, q3 - q1 AS iqr FROM f) " +
        "SELECT vc.l_returnflag AS l_returnflag, min(q1) AS q1, min(q3) AS q3, min(f2.n) AS n_rows, " +
        "CAST(sum(CASE WHEN cents * 2 < q1 * 2 - iqr * 3 THEN wt ELSE 0 END) AS BIGINT) AS n_low, " +
        "CAST(sum(CASE WHEN cents * 2 > q3 * 2 + iqr * 3 THEN wt ELSE 0 END) AS BIGINT) AS n_high " +
        "FROM vc JOIN f2 USING (l_returnflag) GROUP BY 1 ORDER BY 1"),
    "q_gap_interp" ->
      ("WITH daily AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x " +
        "FROM orders GROUP BY 1, 2), " +
        "span AS (SELECT o_orderpriority, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1), " +
        "spine AS (SELECT o_orderpriority, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), " +
        "CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span), " +
        "j AS (SELECT s.o_orderpriority, s.day, x FROM spine s " +
        "LEFT JOIN daily USING (o_orderpriority, day)), " +
        "c AS (SELECT o_orderpriority, day, x, " +
        "last_value(x IGNORE NULLS) OVER wf AS pv, " +
        "last_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS pd, " +
        "last_value(x IGNORE NULLS) OVER wb AS nv, " +
        "last_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS nd " +
        "FROM j WINDOW wf AS (PARTITION BY o_orderpriority ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wb AS (PARTITION BY o_orderpriority ORDER BY day DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT o_orderpriority, day, " +
        "CAST(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed, " +
        "CASE WHEN x IS NOT NULL THEN x WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv " +
        "ELSE pv + ((nv - pv) * CAST(day - pd AS BIGINT)) // CAST(nd - pd AS BIGINT) END AS filled_cents " +
        "FROM c ORDER BY o_orderpriority, day"),
    "q_order_count_dist" ->
      ("WITH per AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) " +
        "SELECT coalesce(n, 0) AS n_orders, count(*) AS n_custs " +
        "FROM customer LEFT JOIN per ON c_custkey = o_custkey " +
        "GROUP BY 1 ORDER BY n_orders"),
    "q_min_price_supplier" ->
      ("WITH offers AS (SELECT l_partkey, l_suppkey, " +
        "min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS best_c " +
        "FROM lineitem GROUP BY l_partkey, l_suppkey), " +
        "w AS (SELECT l_partkey, l_suppkey AS s_suppkey, best_c AS best_cents, " +
        "row_number() OVER (PARTITION BY l_partkey ORDER BY best_c, l_suppkey) AS rn " +
        "FROM offers) " +
        "SELECT l_partkey, s_suppkey, s_name, best_cents " +
        "FROM w JOIN supplier USING (s_suppkey) WHERE rn = 1 ORDER BY l_partkey"),
    "q_char_ngrams" ->
      ("WITH norm AS (SELECT lang, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t " +
        "FROM documents), " +
        "tri AS (SELECT lang, substr(t, CAST(i AS INTEGER), 3) AS tri FROM norm, " +
        "LATERAL (SELECT unnest(generate_series(1, length(t) - 2)) AS i) u " +
        "WHERE length(t) >= 3), " +
        "cnt AS (SELECT lang, tri, count(*) AS n FROM tri GROUP BY lang, tri), " +
        "rk AS (SELECT lang, tri, n, row_number() OVER " +
        "(PARTITION BY lang ORDER BY n DESC, tri) AS rk FROM cnt) " +
        "SELECT lang, tri, n, rk FROM rk WHERE rk <= 15 ORDER BY lang, rk"),
    "q_interarrival" ->
      ("WITH g AS (SELECT event_type, (epoch_us(ts) - lag(epoch_us(ts)) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s FROM events), " +
        "vw AS (SELECT event_type, gap_s, count(*) AS wt FROM g " +
        "WHERE gap_s IS NOT NULL GROUP BY event_type, gap_s), " +
        "c AS (SELECT event_type, gap_s, wt, " +
        "sum(wt) OVER (PARTITION BY event_type ORDER BY gap_s " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "sum(wt) OVER (PARTITION BY event_type) AS n FROM vw) " +
        "SELECT event_type, min(CASE WHEN cum * 2 >= n THEN gap_s END) AS p50_s, " +
        "min(CASE WHEN cum * 10 >= n * 9 THEN gap_s END) AS p90_s, " +
        "max(gap_s) AS max_s, CAST(min(n) AS BIGINT) AS n_gaps " +
        "FROM c GROUP BY event_type ORDER BY event_type"),
    "q_norm_outliers" ->
      // coalesce matches Spark's aggregate() identity: an empty embedding
      // array yields 0 in Spark but NULL from DuckDB's list_sum — pinned
      // non-empty in FixturesSpec, and made divergence-proof here anyway
      ("WITH n2 AS (SELECT vec_id, label, " +
        "CAST(coalesce(list_sum(list_transform(embedding::DOUBLE[], " +
        "x -> CAST(round(x * 1000) AS BIGINT) * CAST(round(x * 1000) AS BIGINT))), 0) AS BIGINT) AS norm2_mu " +
        "FROM embeddings), " +
        "b AS (SELECT vec_id, label, norm2_mu, norm2_mu // 10000 AS q FROM n2), " +
        "vw AS (SELECT label, q, count(*) AS wt FROM b GROUP BY label, q), " +
        "c AS (SELECT label, q, wt, sum(wt) OVER (PARTITION BY label ORDER BY q " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "sum(wt) OVER (PARTITION BY label) AS n FROM vw), " +
        "med AS (SELECT label, min(CASE WHEN cum * 2 >= n THEN q END) AS med_q FROM c GROUP BY label) " +
        "SELECT vec_id, b.label AS label, norm2_mu, q, " +
        "CASE WHEN q > med_q * 2 THEN 'high' WHEN q * 2 < med_q THEN 'low' ELSE 'ok' END AS flag " +
        "FROM b JOIN med ON b.label = med.label ORDER BY vec_id"),
    "q_idle_customers" ->
      ("WITH c AS (SELECT c_custkey, c_nationkey, " +
        "CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer), " +
        "s AS (SELECT CAST(sum(cents) AS BIGINT) AS sum_pos, count(*) AS n_pos " +
        "FROM c WHERE cents > 0) " +
        "SELECT c_nationkey, count(*) AS n_cust, CAST(sum(cents) AS BIGINT) AS bal_cents " +
        "FROM c, s WHERE cents * n_pos > sum_pos " +
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderpriority = '1-URGENT') " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),
    "q_cross_source_dup" ->
      ("WITH norm AS (SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t, source " +
        "FROM documents), " +
        "fs AS (SELECT DISTINCT " +
        "md5(array_to_string(string_split(t, ' ')[1:5], ' ')) AS fp, source FROM norm) " +
        "SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared_fp " +
        "FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_seasonality_index" ->
      ("WITH m AS (SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS moy, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM orders GROUP BY 1, 2), " +
        "t AS (SELECT o_orderpriority, moy, cents, " +
        "CAST(sum(cents) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS tot FROM m) " +
        "SELECT o_orderpriority, moy, cents, " +
        ppmDivSql("cents", "tot") + " AS ppm " +
        "FROM t ORDER BY 1, 2"),
    "q_snapshot_diff" ->
      ("WITH o AS (SELECT o_orderkey AS k, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "old AS (SELECT k, cents AS old_c FROM o WHERE k % 7 != 0), " +
        "nw AS (SELECT k, cents + CASE WHEN k % 3 = 0 THEN 1000 ELSE 0 END AS new_c " +
        "FROM o WHERE k % 5 != 0), " +
        "j AS (SELECT old_c, new_c FROM old FULL OUTER JOIN nw ON old.k = nw.k) " +
        "SELECT CASE WHEN old_c IS NULL THEN 'added' WHEN new_c IS NULL THEN 'removed' " +
        "WHEN old_c = new_c THEN 'unchanged' ELSE 'changed' END AS status, " +
        "count(*) AS n, CAST(sum(coalesce(new_c, 0) - coalesce(old_c, 0)) AS BIGINT) AS delta_cents " +
        "FROM j GROUP BY 1 ORDER BY 1"),
    "q_burst_days" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "t AS (SELECT event_type, day, n, sum(n) OVER w AS trail, count(n) OVER w AS trail_days " +
        "FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) " +
        "SELECT event_type, day, CAST(n AS BIGINT) AS n, CAST(trail AS BIGINT) AS trail " +
        "FROM t WHERE trail_days = 7 AND n * 7 > trail * 2 ORDER BY event_type, day"),
    "q_max_concurrency" ->
      // islands-reconstructed 24h sessions (the q_sessionize half-open gap
      // convention), session end = last event + gap (session_window
      // semantics), then the sweep in one ordered window over the
      // per-instant net deltas
      ("WITH l AS (SELECT user_id, epoch_us(ts) AS tu, " +
        "epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS pt FROM events), " +
        "f AS (SELECT user_id, tu, CASE WHEN pt IS NULL OR tu - pt >= 86400000000 " +
        "THEN 1 ELSE 0 END AS brk FROM l), " +
        "s AS (SELECT user_id, tu, sum(brk) OVER (PARTITION BY user_id ORDER BY tu " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f), " +
        "sess AS (SELECT user_id, sid, min(tu) AS t0, max(tu) + 86400000000 AS t1 " +
        "FROM s GROUP BY user_id, sid), " +
        "b AS (SELECT t, CAST(sum(delta) AS BIGINT) AS net FROM " +
        "(SELECT t0 AS t, 1 AS delta FROM sess UNION ALL SELECT t1, -1 FROM sess) u " +
        "GROUP BY t), " +
        "p AS (SELECT t, net, CAST(coalesce(sum(net) OVER (ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + net AS BIGINT) AS conc FROM b) " +
        "SELECT CAST(make_timestamp(t) AS DATE) AS day, max(conc) AS max_conc, " +
        "count(*) AS n_boundaries FROM p GROUP BY 1 ORDER BY day"),
    "q_dedup_survivorship" ->
      ("WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm " +
        "FROM documents), " +
        "t AS (SELECT doc_id, md5(norm) AS fp, CAST(length(norm) AS BIGINT) AS len FROM n), " +
        "w AS (SELECT fp, len AS best_len, doc_id AS canonical_id, row_number() OVER " +
        "(PARTITION BY fp ORDER BY len DESC, doc_id) AS rn FROM t) " +
        "SELECT t.doc_id, w.canonical_id, w.best_len, " +
        "t.doc_id = w.canonical_id AS survives " +
        "FROM t JOIN w ON t.fp = w.fp AND w.rn = 1 ORDER BY t.doc_id"),
    "q_growth_accounting" ->
      ("WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "t AS (SELECT user_id, day, lag(day) OVER w AS prev, lead(day) OVER w AS next " +
        "FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY day)), " +
        "st AS (SELECT day, count(*) AS dau, " +
        "CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS new_users, " +
        "CAST(sum(CASE WHEN prev = day - INTERVAL 1 DAY THEN 1 ELSE 0 END) AS BIGINT) AS retained, " +
        "CAST(sum(CASE WHEN prev IS NOT NULL AND prev < day - INTERVAL 1 DAY THEN 1 ELSE 0 END) AS BIGINT) AS resurrected " +
        "FROM t GROUP BY day), " +
        "ch AS (SELECT CAST(day + INTERVAL 1 DAY AS DATE) AS day, count(*) AS churned " +
        "FROM t WHERE next IS NULL OR next > day + INTERVAL 1 DAY GROUP BY 1) " +
        "SELECT coalesce(st.day, ch.day) AS day, coalesce(dau, 0) AS dau, " +
        "coalesce(new_users, 0) AS new_users, coalesce(retained, 0) AS retained, " +
        "coalesce(resurrected, 0) AS resurrected, coalesce(churned, 0) AS churned " +
        "FROM st FULL OUTER JOIN ch ON st.day = ch.day ORDER BY day"),
    "q_quantile_normalize" ->
      ("WITH ev AS (SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events), " +
        "r AS (SELECT event_id, cents, " +
        "CAST(row_number() OVER (ORDER BY cents, event_id) AS BIGINT) AS rk, " +
        "count(*) OVER () AS n_total FROM ev) " +
        "SELECT event_id, cents, CASE WHEN n_total = 1 THEN 0 ELSE " +
        ppmDivSql("(rk - 1)", "(n_total - 1)") + " END AS rank_ppm " +
        "FROM r ORDER BY event_id"),
    "q_div_convention" ->
      ("WITH s AS (SELECT n_nationkey, CAST((n_nationkey - 12) * 137 AS BIGINT) AS v FROM nation) " +
        "SELECT n_nationkey, v, v // 100 AS q_trunc, v % 100 AS r_trunc, " +
        "(v + (CASE WHEN v < 0 THEN -50 ELSE 50 END)) // 100 AS q_half " +
        "FROM s ORDER BY n_nationkey"),
    "q_media_summary" ->
      ("WITH m AS (SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END AS kind, " +
        "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format, " +
        "CASE doc_id % 3 WHEN 1 THEN 1000 + (doc_id % 11) * 500 " +
        "WHEN 2 THEN 4000 + (doc_id % 7) * 1000 ELSE 0 END AS duration_ms FROM documents) " +
        "SELECT kind, format, count(*) AS n, " +
        "CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms " +
        "FROM m GROUP BY kind, format ORDER BY kind, format"),
    "q_forecast_revenue" ->
      ("SELECT CAST(sum(price_c * d4) AS BIGINT) AS revenue_u6, count(*) AS n_lines FROM " +
        "(SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c, " +
        "CAST(round(l_discount * 10000, 0) AS BIGINT) AS d4 FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_quantity < 24) WHERE d4 BETWEEN 500 AND 700"),
    "q_volume_shipping" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey, CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(10000 - CAST(round(l_discount * 10000, 0) AS BIGINT)) AS rev_u6 FROM lineitem), " +
        "sn AS (SELECT s_suppkey, s_nationkey AS supp_nation FROM supplier), " +
        "cn AS (SELECT c_custkey, c_nationkey AS cust_nation FROM customer), " +
        "o AS (SELECT o_orderkey, cust_nation FROM orders JOIN cn ON o_custkey = c_custkey) " +
        "SELECT supp_nation, cust_nation, l_year, CAST(sum(rev_u6) AS BIGINT) AS revenue_u6, " +
        "count(*) AS n_lines FROM li JOIN sn ON l_suppkey = s_suppkey " +
        "JOIN o ON l_orderkey = o_orderkey WHERE supp_nation <> cust_nation " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    "q_brand_qty_revenue" ->
      ("WITH pt AS (SELECT p_partkey, p_brand, p_size FROM part " +
        "WHERE p_brand IN ('Brand#3', 'Brand#9', 'Brand#15')), " +
        "li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
        "(10000 - CAST(round(l_discount * 10000, 0) AS BIGINT)) AS rev_u6 FROM lineitem " +
        "WHERE l_quantity BETWEEN 1 AND 30) " +
        "SELECT p_brand, CAST(sum(rev_u6) AS BIGINT) AS revenue_u6, count(*) AS n_lines " +
        "FROM li JOIN pt ON l_partkey = p_partkey WHERE " +
        "(p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND qty BETWEEN 1 AND 11) OR " +
        "(p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 25 AND qty BETWEEN 10 AND 20) OR " +
        "(p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND qty BETWEEN 20 AND 30) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_doc_len_hist" ->
      ("WITH b2 AS (SELECT range AS b, (CAST(1 AS BIGINT) << range) AS lo, " +
        "(CAST(1 AS BIGINT) << (range + 1)) AS hi FROM range(0, 21)) " +
        "SELECT lang, b, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents JOIN b2 ON n_chars >= lo AND n_chars < hi " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_lang_mix" ->
      ("WITH cells AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2), " +
        "totals AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM cells GROUP BY 1) " +
        "SELECT source, lang, n, " + ppmDivSql("n", "tot") + " AS ppm " +
        "FROM cells JOIN totals USING (source) ORDER BY source, lang"),
    "q_interleave" ->
      ("WITH srcs AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS src_idx, " +
        "count(*) OVER () AS n_src FROM (SELECT DISTINCT source FROM documents)), " +
        "r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source " +
        "ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) AS rn FROM documents) " +
        "SELECT doc_id, r.source, (rn - 1) * n_src + src_idx AS pos " +
        "FROM r JOIN srcs ON r.source = srcs.source ORDER BY pos"),
    "q_band_stats" ->
      (SIG_CTE + " " +
        (1 to 4).map(i =>
          s"SELECT CAST($i AS BIGINT) AS band, size, count(*) AS n_buckets FROM " +
            s"(SELECT count(*) AS size FROM sig GROUP BY mh$i) GROUP BY size")
          .mkString(" UNION ALL ") +
        " ORDER BY band, size"),
    "q_order_priority" ->
      ("SELECT o_orderpriority, count(*) AS n_orders FROM orders " +
        "WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01' " +
        "AND CAST(o_orderdate AS DATE) < DATE '1996-04-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_late_suppliers" ->
      ("WITH po AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp, " +
        "count(DISTINCT CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60 " +
        "THEN l_suppkey END) AS n_late, " +
        "max(CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60 " +
        "THEN l_suppkey END) AS blame " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderstatus = 'F' GROUP BY l_orderkey) " +
        "SELECT s_name, s_suppkey, count(*) AS numwait " +
        "FROM po JOIN supplier ON blame = s_suppkey " +
        "WHERE n_supp >= 2 AND n_late = 1 " +
        "GROUP BY s_name, s_suppkey ORDER BY numwait DESC, s_suppkey LIMIT 10"),
    "q_bollinger" ->
      ("WITH daily AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) // 10000 AS rev_h " +
        "FROM orders GROUP BY 1, 2), " +
        "w AS (SELECT o_orderpriority, day, rev_h, " +
        "count(*) OVER tw AS n, sum(rev_h) OVER tw AS s, sum(rev_h * rev_h) OVER tw AS s2 " +
        "FROM daily WINDOW tw AS (PARTITION BY o_orderpriority ORDER BY day " +
        "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)), " +
        "b AS (SELECT o_orderpriority, day, rev_h, n, " +
        "n * rev_h - s AS dev, 4 * (n * s2 - s * s) AS var4 FROM w WHERE n >= 4) " +
        "SELECT o_orderpriority, day, rev_h, n AS win_n, " +
        "CASE WHEN dev > 0 THEN 'hi' ELSE 'lo' END AS band " +
        "FROM b WHERE dev <> 0 AND dev * dev > var4 " +
        "ORDER BY o_orderpriority, day"),
    "q_ndcg" ->
      ("WITH p AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_emb FROM embeddings WHERE vec_id < 10), " +
        "c AS (SELECT vec_id, CAST(label AS BIGINT) AS label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings WHERE vec_id >= 10), " +
        "sc AS (SELECT q_id, q_label, vec_id, label, " +
        "round(list_cosine_similarity(emb, q_emb), 4) AS simr FROM c CROSS JOIN p), " +
        "r AS (SELECT q_id, q_label, vec_id, label, simr, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY simr DESC, vec_id) AS rank FROM sc), " +
        "t AS (SELECT q_id, CASE WHEN label = q_label THEN 1.0 ELSE 0.0 END AS rel, rank " +
        "FROM r WHERE rank <= 10), " +
        "g AS (SELECT q_id, sum(rel / log2(rank + 1)) AS dcg, CAST(sum(rel) AS BIGINT) AS n_rel " +
        "FROM t GROUP BY q_id) " +
        "SELECT q_id, n_rel, round(dcg, 4) AS dcg, " +
        "CASE WHEN n_rel = 0 THEN 0.0 ELSE round(dcg / list_sum(" +
        "list_transform(generate_series(1, n_rel), i -> 1.0 / log2(i + 1.0))), 4) END AS ndcg " +
        "FROM g ORDER BY q_id"),
    "q_feature_hash" ->
      (TP_TOK_CTE +
        ", tc AS (SELECT token, count(*) AS c FROM tok GROUP BY token)" +
        ", bk AS (SELECT CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 64 AS bucket, " +
        "CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types FROM tc GROUP BY 1)" +
        ", t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM bk) " +
        "SELECT bucket, n_tokens, n_types, " + ppmDivSql("n_tokens", "tt") +
        " AS load_ppm FROM bk CROSS JOIN t ORDER BY bucket"),
    "q_doc_entropy" ->
      (TP_TOK_CTE +
        ", tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token)" +
        ", g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types, " +
        "sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clog FROM tc GROUP BY doc_id) " +
        "SELECT doc_id, n_tokens, n_types, " +
        "round(log2(CAST(n_tokens AS DOUBLE)) - clog / n_tokens, 4) AS entropy_bits " +
        "FROM g ORDER BY doc_id"),
    "q_mips" ->
      ("WITH probe AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS p " +
        "FROM embeddings WHERE vec_id = 1) " +
        "SELECT vec_id, round(list_inner_product(" +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)), p), 4) AS dot, label " +
        "FROM embeddings, probe WHERE vec_id <> 1 ORDER BY dot DESC, vec_id LIMIT 20"),
    "q_bpe_merges" ->
      (TP_TOK_CTE +
        ", t2 AS (SELECT token FROM tok WHERE length(token) >= 2)" +
        ", pr AS (SELECT unnest(list_transform(generate_series(1, length(token) - 1), " +
        "i -> substr(token, CAST(i AS INTEGER), 2))) AS pair FROM t2) " +
        "SELECT pair, count(*) AS n_occ FROM pr GROUP BY pair " +
        "ORDER BY n_occ DESC, pair LIMIT 20"),
    "q_clustering_coeff" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "t AS (SELECT x.pa AS a, x.pb AS b, y.pb AS c FROM e x " +
        "JOIN e y ON x.pb = y.pa JOIN e z ON z.pa = x.pa AND z.pb = y.pb), " +
        "m AS (SELECT unnest([a, b, c]) AS n FROM t), " +
        "tc AS (SELECT n, count(*) AS n_tri FROM m GROUP BY n), " +
        "dg AS (SELECT n, count(*) AS deg FROM " +
        "(SELECT pa AS n FROM e UNION ALL SELECT pb AS n FROM e) GROUP BY n) " +
        "SELECT dg.n AS l_partkey, deg, coalesce(n_tri, 0) AS n_tri, " +
        "(coalesce(n_tri, 0) * 1000000) // ((deg * (deg - 1)) // 2) AS coeff_ppm " +
        "FROM dg LEFT JOIN tc ON dg.n = tc.n WHERE deg >= 2 " +
        "ORDER BY coeff_ppm DESC, l_partkey LIMIT 20"),
    "q_frame_sample" ->
      ("WITH m AS (SELECT doc_id AS media_id, 4000 + (doc_id % 7) * 1000 AS duration_ms " +
        "FROM documents WHERE doc_id % 3 = 2), " +
        "f AS (SELECT media_id, unnest(generate_series(0, " +
        "CAST(least(greatest(duration_ms // 1000, 1), 8) AS BIGINT) - 1)) AS frame_idx FROM m) " +
        "SELECT media_id, frame_idx, frame_idx * 1000 AS offset_ms, " +
        "CAST('0x' || substr(md5(concat_ws('|', media_id, frame_idx * 1000)), 1, 15) AS BIGINT) AS frame_hash " +
        "FROM f ORDER BY media_id, frame_idx"),
    "q_nation_profit" ->
      ("WITH p AS (SELECT p_partkey, CAST(round(p_retailprice * 100, 0) AS BIGINT) AS retail_c " +
        "FROM part WHERE p_name LIKE '%red%'), " +
        "sn AS (SELECT s_suppkey, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey), " +
        "li AS (SELECT l_partkey, l_suppkey, CAST(year(l_shipdate) AS BIGINT) AS o_year, " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c, " +
        "CAST(round(l_discount * 10000, 0) AS BIGINT) AS d4, " +
        "CAST(l_quantity AS BIGINT) AS qty FROM lineitem) " +
        "SELECT n_name, o_year, " +
        "CAST(sum(price_c * (10000 - d4) - qty * retail_c * 8000) AS BIGINT) AS profit_u6, " +
        "count(*) AS n_lines " +
        "FROM li JOIN p ON l_partkey = p_partkey JOIN sn ON l_suppkey = s_suppkey " +
        "GROUP BY n_name, o_year ORDER BY n_name, o_year"),
    "q_part_supplier_counts" ->
      ("WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), " +
        "ok AS (SELECT l_partkey, l_suppkey FROM rel WHERE l_suppkey NOT IN " +
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) " +
        "SELECT p_brand, p_type, p_size, " +
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
        "FROM ok JOIN part ON l_partkey = p_partkey WHERE p_brand <> 'Brand#17' " +
        "GROUP BY p_brand, p_type, p_size " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20"),
    "q_dominant_supplier" ->
      ("WITH pairs AS (SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_qty " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY 1, 2), " +
        "tot AS (SELECT l_partkey, CAST(sum(s_qty) AS BIGINT) AS tot_qty FROM pairs GROUP BY 1), " +
        "dom AS (SELECT l_suppkey AS s_suppkey, count(*) AS n_parts_dominated, " +
        "CAST(sum(s_qty) AS BIGINT) AS qty_dominated " +
        "FROM pairs JOIN tot USING (l_partkey) WHERE s_qty * 2 > tot_qty GROUP BY 1) " +
        "SELECT s_name, s_suppkey, n_parts_dominated, qty_dominated " +
        "FROM dom JOIN supplier USING (s_suppkey) " +
        "ORDER BY n_parts_dominated DESC, s_suppkey LIMIT 20"),
    "q_blocklist_filter" ->
      (NORM_CTE.replace("SELECT doc_id,", "SELECT doc_id, source,") +
        ", tk AS (SELECT source, string_split(t, ' ') AS toks, t FROM norm) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN len(list_filter(toks, x -> x IN ('slow','dup','stream','sort'))) > 0 " +
        "AND t <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked, " +
        Seq("slow", "dup", "stream", "sort").map(t =>
          s"CAST(sum(CASE WHEN list_contains(toks, '$t') AND t <> '' THEN 1 ELSE 0 END) AS BIGINT) AS hits_$t")
          .mkString(", ") +
        " FROM tk GROUP BY source ORDER BY source"),
    // every CTE is MATERIALIZED: the final readout references each round's
    // edge set more than once, and DuckDB's default inlining would re-derive
    // the whole chain (including the quadratic e0 self-join) per reference —
    // measured as a disk-spill blowup at sf1 (6.6 s materialized)
    "q_kcore" ->
      ("WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e0 AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2)" +
        (1 to KcoreCap).map { i =>
          val p = i - 1
          s", d$p AS MATERIALIZED (SELECT n, count(*) AS d FROM (SELECT pa AS n FROM e$p UNION ALL SELECT pb AS n FROM e$p) GROUP BY n)" +
            s", k$p AS MATERIALIZED (SELECT n FROM d$p WHERE d >= 2)" +
            s", e$i AS MATERIALIZED (SELECT pa, pb FROM e$p WHERE pa IN (SELECT n FROM k$p) AND pb IN (SELECT n FROM k$p))"
        }.mkString + " " +
        (1 to KcoreCap).map { i =>
          val p = i - 1
          s"SELECT CAST($i AS BIGINT) AS round, " +
            s"(SELECT CAST(count(DISTINCT n) AS BIGINT) FROM (SELECT pa AS n FROM e$i UNION ALL SELECT pb AS n FROM e$i)) AS n_nodes, " +
            s"(SELECT count(*) FROM e$i) AS n_edges, " +
            s"CAST((SELECT count(*) FROM e$i) = (SELECT count(*) FROM e$p) AS BIGINT) AS converged"
        }.mkString(" UNION ALL ") +
        " ORDER BY round"),
    "q_attribution" ->
      ("WITH w AS (SELECT user_id, ts, event_id, event_type, " +
        "max(CASE WHEN event_type <> 'purchase' THEN {'ts': ts, 'eid': event_id, 'etype': event_type} END) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev " +
        "FROM events), " +
        "p AS (SELECT CASE WHEN prev IS NULL OR " +
        "CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(struct_extract(prev, 'ts'))) AS BIGINT) > 604800 " +
        "THEN 'direct' ELSE struct_extract(prev, 'etype') END AS channel " +
        "FROM w WHERE event_type = 'purchase') " +
        "SELECT channel, count(*) AS n_purchases FROM p GROUP BY channel ORDER BY channel"),
    "q_late_arrivals" ->
      ("WITH w AS (SELECT user_id, ts, event_id, " +
        "max(ts) OVER (PARTITION BY user_id " +
        "ORDER BY CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT), event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm " +
        "FROM events), " +
        "l AS (SELECT CAST(floor(epoch(hwm)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) AS late_s FROM w), " +
        "b AS (SELECT CAST(CASE WHEN late_s IS NULL OR late_s <= 0 THEN -1 " +
        "WHEN late_s <= 1 THEN 0 WHEN late_s <= 2 THEN 1 WHEN late_s <= 4 THEN 2 " +
        "WHEN late_s <= 8 THEN 3 WHEN late_s <= 16 THEN 4 WHEN late_s <= 32 THEN 5 " +
        "WHEN late_s <= 64 THEN 6 WHEN late_s <= 128 THEN 7 WHEN late_s <= 256 THEN 8 " +
        "WHEN late_s <= 512 THEN 9 WHEN late_s <= 1024 THEN 10 WHEN late_s <= 2048 THEN 11 " +
        "WHEN late_s <= 4096 THEN 12 WHEN late_s <= 8192 THEN 13 WHEN late_s <= 16384 THEN 14 " +
        "ELSE 15 END AS BIGINT) AS bucket FROM l) " +
        "SELECT bucket, count(*) AS n_events FROM b GROUP BY bucket ORDER BY bucket"),
    "q_ann_pq" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, CAST(0 AS BIGINT) AS half, list_slice(v, 1, 32) AS cv FROM e WHERE vec_id < 8 " +
        "UNION ALL SELECT vec_id, CAST(1 AS BIGINT), list_slice(v, 33, 64) FROM e WHERE vec_id < 8), " +
        "s AS (SELECT vec_id, CAST(0 AS BIGINT) AS half, list_slice(v, 1, 32) AS sv FROM e " +
        "UNION ALL SELECT vec_id, CAST(1 AS BIGINT), list_slice(v, 33, 64) FROM e), " +
        "dist AS (SELECT s.vec_id, s.half, c.cid, " +
        "list_sum(list_transform(generate_series(1, 32), i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS dd " +
        "FROM s JOIN c ON s.half = c.half), " +
        "codes AS (SELECT vec_id, half, struct_extract(min({'d': dd, 'cid': cid}), 'cid') AS code " +
        "FROM dist GROUP BY 1, 2), " +
        "pd AS (SELECT half, cid, dd AS pd FROM dist WHERE vec_id = 0), " +
        "ad AS (SELECT codes.vec_id, CAST(sum(pd.pd) AS DOUBLE) AS adist " +
        "FROM codes JOIN pd ON codes.half = pd.half AND codes.code = pd.cid GROUP BY 1) " +
        "SELECT vec_id, round(adist, 4) AS adist FROM ad WHERE vec_id <> 0 " +
        "ORDER BY adist, vec_id LIMIT 10"),
    "q_quantized_rerank" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "p AS (SELECT v AS pv, list_transform(v, x -> CAST(round(x * 128, 0) AS BIGINT)) AS pc FROM e WHERE vec_id = 2), " +
        "c AS (SELECT vec_id, v, list_transform(v, x -> CAST(round(x * 128, 0) AS BIGINT)) AS cc FROM e WHERE vec_id <> 2), " +
        "sc AS (SELECT vec_id, v, CAST(list_sum(list_transform(generate_series(1, 64), i -> cc[i] * pc[i])) AS BIGINT) AS idot " +
        "FROM c CROSS JOIN p), " +
        "top AS (SELECT vec_id, v, idot FROM sc ORDER BY idot DESC, vec_id LIMIT 50) " +
        "SELECT vec_id, idot, round(list_cosine_similarity(v, pv), 4) AS sim " +
        "FROM top CROSS JOIN p ORDER BY sim DESC, vec_id LIMIT 10"),
    "q_bigram_ppx" ->
      (TP_TOK_CTE +
        ", bi AS (SELECT doc_id, token || ' ' || lead(token) OVER w AS bigram, token AS w1 " +
        "FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))" +
        ", bi2 AS (SELECT doc_id, bigram, w1 FROM bi WHERE bigram IS NOT NULL)" +
        ", bc AS (SELECT bigram, count(*) AS c12 FROM bi2 GROUP BY bigram)" +
        ", wc AS (SELECT w1, count(*) AS c1 FROM bi2 GROUP BY w1) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "round(sum(log2(CAST(c1 AS DOUBLE)) - log2(CAST(c12 AS DOUBLE))) / count(*), 4) AS surprisal_bits " +
        "FROM bi2 JOIN bc USING (bigram) JOIN wc USING (w1) " +
        "GROUP BY doc_id ORDER BY doc_id"),
    "q_pit_join" ->
      ("WITH dim AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS valid_from, " +
        "CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_orders, " +
        "lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey " +
        "ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS valid_to FROM orders), " +
        "ev AS (SELECT user_id, CAST(ts AS DATE) AS ed, " +
        "CAST(round(value * 100, 0) AS BIGINT) AS val_c FROM events), " +
        "j AS (SELECT coalesce(dim.n_orders, 0) AS n_orders_at_event, ev.val_c " +
        "FROM ev LEFT JOIN dim ON ev.user_id = dim.o_custkey " +
        "AND ev.ed >= dim.valid_from AND (dim.valid_to IS NULL OR ev.ed < dim.valid_to)) " +
        "SELECT n_orders_at_event, count(*) AS n_events, " +
        "CAST(sum(val_c) AS BIGINT) AS value_c " +
        "FROM j GROUP BY n_orders_at_event ORDER BY n_orders_at_event"),
    "q_negative_sample" ->
      ("WITH bought AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
        "pool AS (SELECT p AS cand FROM (SELECT p, count(*) AS n_buyers FROM bought GROUP BY p) " +
        "ORDER BY n_buyers DESC, p LIMIT 50), " +
        "users AS (SELECT DISTINCT c FROM bought), " +
        "nest AS (SELECT c, cand FROM users CROSS JOIN pool " +
        "WHERE NOT EXISTS (SELECT 1 FROM bought b WHERE b.c = users.c AND b.p = cand)), " +
        "r AS (SELECT c, cand, CAST(row_number() OVER (PARTITION BY c " +
        "ORDER BY ((c * 131071 + cand) % 2147483648) * 2654435761 % 4294967296, cand) AS BIGINT) AS rank " +
        "FROM nest) " +
        "SELECT c AS c_custkey, cand AS l_partkey, rank FROM r WHERE rank <= 5 " +
        "ORDER BY c_custkey, rank"),
    "q_kmv_distinct" ->
      ("WITH hv AS (SELECT DISTINCT event_type, " +
        "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) AS h FROM events), " +
        "p1 AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type, " +
        "h // 35184372088832 ORDER BY h) AS r1 FROM hv), " +
        "p2 AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type " +
        "ORDER BY h) AS r2 FROM p1 WHERE r1 <= 64), " +
        "sk AS (SELECT event_type, count(*) AS n_sk, max(h) AS kth " +
        "FROM p2 WHERE r2 <= 64 GROUP BY event_type), " +
        "ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact " +
        "FROM events GROUP BY event_type), " +
        "j AS (SELECT ex.event_type, ex.n_exact, CAST(CASE WHEN sk.n_sk < 64 " +
        "THEN sk.n_sk ELSE (63 * 4503599627370496) // sk.kth END AS BIGINT) AS n_kmv " +
        "FROM sk JOIN ex USING (event_type)) " +
        "SELECT event_type, n_exact, n_kmv, " +
        "(abs(n_kmv - n_exact) * 1000000) // n_exact AS err_ppm " +
        "FROM j ORDER BY event_type"),
    "q_kmv_set_ops" ->
      ("WITH hv AS (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS side, " +
        "CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13) AS BIGINT) AS h " +
        "FROM orders WHERE year(o_orderdate) IN (1996, 1997)), " +
        "p1 AS (SELECT side, h, row_number() OVER (PARTITION BY side, " +
        "h // 35184372088832 ORDER BY h) AS r1 FROM hv), " +
        "sk AS (SELECT side, h FROM (SELECT side, h, row_number() OVER " +
        "(PARTITION BY side ORDER BY h) AS r2 FROM p1 WHERE r1 <= 64) WHERE r2 <= 64), " +
        "usk AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r " +
        "FROM (SELECT DISTINCT h FROM sk)) WHERE r <= 64), " +
        "st AS (SELECT count(*) AS n_usk, max(h) AS kth FROM usk), " +
        "sh AS (SELECT count(*) AS shared_k FROM usk " +
        "WHERE h IN (SELECT h FROM sk WHERE side = 1996) " +
        "AND h IN (SELECT h FROM sk WHERE side = 1997)), " +
        "du AS (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS side, o_custkey " +
        "FROM orders WHERE year(o_orderdate) IN (1996, 1997)), " +
        "ue AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_union_exact FROM du), " +
        "ie AS (SELECT CAST(count(*) AS BIGINT) AS n_inter_exact FROM " +
        "(SELECT o_custkey FROM du GROUP BY o_custkey HAVING count(*) = 2)), " +
        "est AS (SELECT n_usk, shared_k, CAST(CASE WHEN n_usk < 64 THEN n_usk " +
        "ELSE (63 * 4503599627370496) // kth END AS BIGINT) AS n_union_kmv " +
        "FROM st CROSS JOIN sh) " +
        "SELECT n_union_exact, n_union_kmv, " +
        "(abs(n_union_kmv - n_union_exact) * 1000000) // n_union_exact AS union_err_ppm, " +
        "n_inter_exact, (shared_k * n_union_kmv) // n_usk AS n_inter_kmv, " +
        "(abs((shared_k * n_union_kmv) // n_usk - n_inter_exact) * 1000000) // n_inter_exact AS inter_err_ppm, " +
        "CAST(shared_k AS BIGINT) AS shared_k, CAST(n_usk AS BIGINT) AS n_usk " +
        "FROM est CROSS JOIN ue CROSS JOIN ie"),
    "q_hist_quantiles" ->
      ("WITH c AS (SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem), " +
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n, min(c) AS mn, max(c) AS mx FROM c), " +
        "h AS (SELECT CASE WHEN mx = mn THEN 0 ELSE ((c - mn) * 64) // (mx - mn + 1) END AS b, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM c CROSS JOIN st GROUP BY 1), " +
        "cm AS (SELECT b, cnt, CAST(coalesce(sum(cnt) OVER (ORDER BY b " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum FROM h), " +
        "t AS (SELECT CAST(p AS BIGINT) AS p, (CAST(p AS BIGINT) * (n - 1)) // 100 AS r, n, mn, mx " +
        "FROM (SELECT unnest([50, 90, 99]) AS p) CROSS JOIN st), " +
        "e AS (SELECT t.p, t.n, t.r, cm.b, cm.cnt, cm.cum, t.mn, t.mx FROM t " +
        "JOIN cm ON t.r >= cm.cum AND t.r < cm.cum + cm.cnt), " +
        "est AS (SELECT p, n, r, " +
        "(CASE WHEN mx = mn THEN mn ELSE mn + (b * (mx - mn + 1)) // 64 END) + " +
        "((r - cum) * ((CASE WHEN mx = mn THEN mx + 1 ELSE mn + ((b + 1) * (mx - mn + 1)) // 64 END) - " +
        "(CASE WHEN mx = mn THEN mn ELSE mn + (b * (mx - mn + 1)) // 64 END))) // cnt AS est_cents FROM e), " +
        "rk AS (SELECT c, row_number() OVER (ORDER BY c) - 1 AS r FROM c), " +
        "ex AS (SELECT t.p, rk.c AS exact_cents FROM t JOIN rk ON rk.r = t.r) " +
        "SELECT est.p, est.n, est_cents, exact_cents, " +
        "(abs(est_cents - exact_cents) * 1000000) // exact_cents AS err_ppm " +
        "FROM est JOIN ex ON est.p = ex.p ORDER BY est.p"),
    "q_cms_estimate" ->
      (TP_TOK_CTE +
        ", tc AS (SELECT token, count(*) AS c FROM tok GROUP BY token)" +
        ", js AS (SELECT unnest([0, 1, 2, 3]) AS j)" +
        ", eb AS (SELECT token, c, j, CAST('0x' || substr(md5(CAST(j AS VARCHAR) " +
        "|| '|' || token), 1, 13) AS BIGINT) % 8 AS bucket FROM tc CROSS JOIN js)" +
        ", cnt AS (SELECT j, bucket, CAST(sum(c) AS BIGINT) AS counter " +
        "FROM eb GROUP BY j, bucket)" +
        ", top AS (SELECT token, c FROM tc ORDER BY c DESC, token LIMIT 20)" +
        ", pr AS (SELECT top.token, top.c, js.j, CAST('0x' || substr(md5(CAST(js.j AS VARCHAR) " +
        "|| '|' || top.token), 1, 13) AS BIGINT) % 8 AS bucket FROM top CROSS JOIN js)" +
        ", est AS (SELECT pr.token, pr.c, min(cnt.counter) AS cms_est " +
        "FROM pr JOIN cnt USING (j, bucket) GROUP BY pr.token, pr.c) " +
        "SELECT token, CAST(c AS BIGINT) AS n_exact, cms_est, " +
        "cms_est - c AS overcount FROM est ORDER BY n_exact DESC, token"),
    "q_pii_redact" ->
      ("WITH cust AS (SELECT c_custkey, 'Customer#' || repeat('*', length(c_name) - 13) " +
        "|| substr(c_name, length(c_name) - 3, 4) AS masked_name, " +
        "substr(md5('graft-pii-v1|' || CAST(c_custkey AS VARCHAR)), 1, 16) AS pseudo FROM customer), " +
        "ev AS (SELECT substr(md5('graft-pii-v1|' || CAST(user_id AS VARCHAR)), 1, 16) AS pseudo, " +
        "count(*) AS n_events FROM events GROUP BY 1) " +
        "SELECT c_custkey, masked_name, pseudo, CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events " +
        "FROM cust LEFT JOIN ev USING (pseudo) ORDER BY c_custkey"),
    "q_k_anonymity" ->
      ("WITH cls AS (SELECT c_nationkey, c_mktsegment, CAST(c_acctbal < 0 AS INTEGER) AS overdrawn, " +
        "CAST(count(*) AS BIGINT) AS k FROM customer GROUP BY 1, 2, 3) " +
        "SELECT k, CAST(count(*) AS BIGINT) AS n_classes, CAST(sum(k) AS BIGINT) AS n_rows, " +
        "CAST(k < 5 AS BIGINT) AS violates_k5 FROM cls GROUP BY k ORDER BY k"),
    "q_zorder_layout" ->
      ("WITH st AS (SELECT min(CAST(l_partkey AS BIGINT)) AS pmin, max(CAST(l_partkey AS BIGINT)) AS pmax, " +
        "min(CAST(l_suppkey AS BIGINT)) AS smin, max(CAST(l_suppkey AS BIGINT)) AS smax FROM lineitem), " +
        "nz AS (SELECT CAST(l_partkey AS BIGINT) AS p, CAST(l_suppkey AS BIGINT) AS sk, " +
        "CASE WHEN pmax = pmin THEN 0 ELSE ((CAST(l_partkey AS BIGINT) - pmin) * 255) // (pmax - pmin) END AS pz, " +
        "CASE WHEN smax = smin THEN 0 ELSE ((CAST(l_suppkey AS BIGINT) - smin) * 255) // (smax - smin) END AS sz " +
        "FROM lineitem CROSS JOIN st), " +
        s"zb AS (SELECT p, sk, pz, sz, (${zInterleave("//")}) // 256 AS bucket FROM nz), " +
        "ag AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows, " +
        "min(p) AS min_p, max(p) AS max_p, min(sk) AS min_s, max(sk) AS max_s, " +
        "min(pz) AS min_pz, max(pz) AS max_pz, min(sz) AS min_sz, max(sz) AS max_sz " +
        "FROM zb GROUP BY bucket) " +
        "SELECT bucket, n_rows, min_p, max_p, min_s, max_s, " +
        "CAST(NOT (max_pz < 96 OR min_pz > 127) AS BIGINT) AS scan_p, " +
        "CAST(NOT (max_sz < 64 OR min_sz > 95) AS BIGINT) AS scan_s " +
        "FROM ag ORDER BY bucket"),
    "q_compaction_plan" ->
      ("WITH f AS (SELECT CAST(l_shipdate AS DATE) AS fdate, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(*) * 128 AS BIGINT) AS bytes FROM lineitem GROUP BY 1), " +
        "p AS (SELECT fdate, n_rows, bytes, CAST(COALESCE(SUM(bytes) OVER (ORDER BY fdate " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pe FROM f), " +
        "b AS (SELECT pe // 65536 + 1 AS bin_id, fdate, n_rows, bytes FROM p) " +
        "SELECT bin_id, CAST(count(*) AS BIGINT) AS n_files, CAST(sum(n_rows) AS BIGINT) AS n_rows, " +
        "CAST(sum(bytes) AS BIGINT) AS bytes, min(fdate) AS from_date, max(fdate) AS to_date " +
        "FROM b GROUP BY bin_id ORDER BY bin_id"),
    "q_join_size_est" ->
      ("WITH kc AS (SELECT l_partkey AS k, " +
        "CAST(sum(CAST(year(l_shipdate) = 1996 AS INTEGER)) AS BIGINT) AS a, " +
        "CAST(sum(CAST(year(l_shipdate) = 1997 AS INTEGER)) AS BIGINT) AS b " +
        "FROM lineitem WHERE year(l_shipdate) IN (1996, 1997) GROUP BY 1), " +
        "ex AS (SELECT CAST(sum(a * b) AS BIGINT) AS n_exact FROM kc), " +
        "kj AS (SELECT k, a, b, j FROM kc CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS j)), " +
        "hb AS (SELECT j, a, b, " +
        "CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 13) AS BIGINT) % 64 AS bucket, " +
        "CASE WHEN CAST('0x' || substr(md5('s' || CAST(j AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 13) AS BIGINT) % 2 = 0 " +
        "THEN 1 ELSE -1 END AS sgn FROM kj), " +
        "ct AS (SELECT j, bucket, CAST(sum(a * sgn) AS BIGINT) AS ca, " +
        "CAST(sum(b * sgn) AS BIGINT) AS cb FROM hb GROUP BY 1, 2), " +
        "ip AS (SELECT j, CAST(sum(ca * cb) AS BIGINT) AS ip FROM ct GROUP BY j), " +
        "md AS (SELECT CAST(ip AS BIGINT) AS est_agms FROM " +
        "(SELECT ip, j, row_number() OVER (ORDER BY ip, j) AS r FROM ip) WHERE r = 5) " +
        "SELECT n_exact, est_agms, " +
        "(abs(est_agms - n_exact) * 1000000) // n_exact AS err_ppm " +
        "FROM md CROSS JOIN ex"),
    "q_ams_f2" ->
      ("WITH uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1), " +
        "ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM uc), " +
        "uj AS (SELECT user_id, c, j FROM uc CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS j)), " +
        "hb AS (SELECT j, c, " +
        "CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) % 64 AS bucket, " +
        "CASE WHEN CAST('0x' || substr(md5('s' || CAST(j AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) % 2 = 0 " +
        "THEN 1 ELSE -1 END AS sgn FROM uj), " +
        "ct AS (SELECT j, bucket, CAST(sum(c * sgn) AS BIGINT) AS sb FROM hb GROUP BY 1, 2), " +
        "e2 AS (SELECT j, CAST(sum(sb * sb) AS BIGINT) AS estj FROM ct GROUP BY j), " +
        "md AS (SELECT CAST(estj AS BIGINT) AS f2_ams FROM " +
        "(SELECT estj, j, row_number() OVER (ORDER BY estj, j) AS r FROM e2) WHERE r = 5) " +
        "SELECT f2_exact, f2_ams, (abs(f2_ams - f2_exact) * 1000000) // f2_exact AS err_ppm " +
        "FROM md CROSS JOIN ex"),
    "q_mrr" ->
      ("WITH p AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_emb FROM embeddings WHERE vec_id < 10), " +
        "c AS (SELECT vec_id, CAST(label AS BIGINT) AS label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings WHERE vec_id >= 10), " +
        "sc AS (SELECT q_id, q_label, vec_id, label, " +
        "round(list_cosine_similarity(emb, q_emb), 4) AS simr FROM c CROSS JOIN p), " +
        "r AS (SELECT q_id, q_label, vec_id, label, simr, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY simr DESC, vec_id) AS rank FROM sc), " +
        "h AS (SELECT q_id, CAST(min(rank) AS BIGINT) AS frr FROM r " +
        "WHERE rank <= 10 AND label = q_label GROUP BY q_id) " +
        "SELECT p.q_id, CAST(coalesce(frr, 0) AS BIGINT) AS first_rel_rank, " +
        "CAST(CASE WHEN frr IS NULL THEN 0 ELSE 1000000 // frr END AS BIGINT) AS rr_ppm " +
        "FROM p LEFT JOIN h ON p.q_id = h.q_id ORDER BY p.q_id"),
    "q_rank_fusion" ->
      ("WITH probe AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS p " +
        "FROM embeddings WHERE vec_id = 1), " +
        "sc AS (SELECT vec_id, " +
        "round(list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), p), 4) AS simr, " +
        "round(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), p), 4) AS dotr " +
        "FROM embeddings, probe WHERE vec_id <> 1), " +
        "tc AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY simr DESC, vec_id) AS BIGINT) AS rank_cos " +
        "FROM sc QUALIFY rank_cos <= 20), " +
        "td AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY dotr DESC, vec_id) AS BIGINT) AS rank_dot " +
        "FROM sc QUALIFY rank_dot <= 20), " +
        "f AS (SELECT coalesce(tc.vec_id, td.vec_id) AS vec_id, " +
        "CAST(coalesce(rank_cos, 0) AS BIGINT) AS rank_cos, CAST(coalesce(rank_dot, 0) AS BIGINT) AS rank_dot " +
        "FROM tc FULL OUTER JOIN td ON tc.vec_id = td.vec_id) " +
        "SELECT vec_id, rank_cos, rank_dot, " +
        "CAST(CASE WHEN rank_cos = 0 THEN 0 ELSE 1000000000 // (60 + rank_cos) END + " +
        "CASE WHEN rank_dot = 0 THEN 0 ELSE 1000000000 // (60 + rank_dot) END AS BIGINT) AS rrf_ppb " +
        "FROM f ORDER BY rrf_ppb DESC, vec_id LIMIT 10"),
    "q_dsir_weights" ->
      (TP_TOK_CTE +
        ", bk AS (SELECT doc_id, source, " +
        "CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 256 AS b FROM tok)" +
        ", dist AS (SELECT b, CAST(sum(CAST(source = 'src0' AS INTEGER)) AS BIGINT) AS ct, " +
        "CAST(sum(CAST(source <> 'src0' AS INTEGER)) AS BIGINT) AS cr FROM bk GROUP BY b)" +
        ", tt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr FROM dist)" +
        ", ratio AS (SELECT b, log2(CAST(ct + 1 AS DOUBLE)) - log2(CAST(nt + 256 AS DOUBLE)) " +
        "- log2(CAST(cr + 1 AS DOUBLE)) + log2(CAST(nr + 256 AS DOUBLE)) AS llr " +
        "FROM dist CROSS JOIN tt) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "round(sum(llr), 4) AS logw, CAST(sum(llr) > 0 AS BIGINT) AS keep " +
        "FROM bk JOIN ratio USING (b) GROUP BY doc_id ORDER BY doc_id"),
    "q_chi2_tokens" ->
      ("""WITH norm AS (SELECT doc_id, lang, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)""" +
        ", tok AS (SELECT lang, unnest(string_split(t, ' ')) AS token FROM norm WHERE t <> '')" +
        ", tc AS (SELECT token, CAST(sum(CAST(lang = 'en' AS INTEGER)) AS BIGINT) AS a, " +
        "CAST(sum(CAST(lang <> 'en' AS INTEGER)) AS BIGINT) AS b FROM tok GROUP BY token)" +
        ", tt AS (SELECT CAST(sum(CAST(lang = 'en' AS INTEGER)) AS BIGINT) AS ta, " +
        "CAST(sum(CAST(lang <> 'en' AS INTEGER)) AS BIGINT) AS tb FROM tok)" +
        ", sc AS (SELECT token, a, b, ta - a AS c, tb - b AS d FROM tc CROSS JOIN tt " +
        "WHERE a + b >= 5) " +
        "SELECT token, a, b, round(CAST(a + b + c + d AS DOUBLE) * " +
        "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) * " +
        "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) " +
        "/ (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)), 4) AS chi2 " +
        "FROM sc ORDER BY chi2 DESC, token LIMIT 20"),
    "q_group_quantiles" ->
      ("WITH cents AS (SELECT c_nationkey AS nation, " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey), " +
        "st AS (SELECT nation, CAST(count(*) AS BIGINT) AS n, min(c) AS mn, max(c) AS mx " +
        "FROM cents GROUP BY 1), " +
        "wb AS (SELECT nation, c, CASE WHEN mx = mn THEN CAST(0 AS BIGINT) " +
        "ELSE ((c - mn) * 32) // (mx - mn + 1) END AS b FROM cents JOIN st USING (nation)), " +
        "h AS (SELECT nation, b, CAST(count(*) AS BIGINT) AS cnt FROM wb GROUP BY 1, 2), " +
        "cm AS (SELECT nation, b, cnt, CAST(coalesce(sum(cnt) OVER (PARTITION BY nation " +
        "ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum FROM h), " +
        "tg AS (SELECT nation, CAST(p AS BIGINT) AS p, n, mn, mx, (CAST(p AS BIGINT) * (n - 1)) // 100 AS r " +
        "FROM st CROSS JOIN (SELECT unnest([50, 95]) AS p)), " +
        "es AS (SELECT tg.nation, p, n, r, b, cum, cnt, mn, mx, " +
        "CASE WHEN mx = mn THEN mn ELSE mn + (b * (mx - mn + 1)) // 32 END AS lo, " +
        "CASE WHEN mx = mn THEN mx + 1 ELSE mn + ((b + 1) * (mx - mn + 1)) // 32 END AS hi " +
        "FROM tg JOIN cm ON tg.nation = cm.nation AND r >= cum AND r < cum + cnt), " +
        "e2 AS (SELECT nation, p, n, r, b, cum, lo + ((r - cum) * (hi - lo)) // cnt AS est_cents FROM es), " +
        "rk AS (SELECT wb.nation, e2.p, wb.c, " +
        "row_number() OVER (PARTITION BY wb.nation, wb.b, e2.p ORDER BY wb.c) AS rk, " +
        "r - cum + 1 AS t FROM wb JOIN e2 ON wb.nation = e2.nation AND wb.b = e2.b), " +
        "ex AS (SELECT nation, p, c AS exact_cents FROM rk WHERE rk = t) " +
        "SELECT e2.nation, e2.p, n, est_cents, exact_cents, " +
        "(abs(est_cents - exact_cents) * 1000000) // exact_cents AS err_ppm " +
        "FROM e2 JOIN ex ON e2.nation = ex.nation AND e2.p = ex.p ORDER BY 1, 2"),
    "q_temperature_mix" ->
      ("WITH src AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars, " +
        "CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE) * 1000000.0)) AS BIGINT) AS w " +
        "FROM documents GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tn, CAST(sum(w) AS BIGINT) AS tw FROM src) " +
        "SELECT source, n_chars, " +
        s"CAST(${ppmDivSql("n_chars", "tn")} AS BIGINT) AS raw_ppm, " +
        s"CAST(${ppmDivSql("w", "tw")} AS BIGINT) AS temp_ppm, " +
        s"CAST((CAST(${ppmDivSql("w", "tw")} AS BIGINT) * 1000000) // " +
        s"CAST(${ppmDivSql("n_chars", "tn")} AS BIGINT) AS BIGINT) AS boost_ppm " +
        "FROM src CROSS JOIN tot ORDER BY source"),
    "q_dp_counts" ->
      ("WITH uc AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c " +
        "FROM events GROUP BY 1, 2), " +
        "cl AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events, " +
        "CAST(sum(least(c, 5)) AS BIGINT) AS n_clipped FROM uc GROUP BY 1), " +
        "nz AS (SELECT event_type, n_events, n_clipped, " +
        "(CAST('0x' || substr(md5('dp' || event_type), 1, 13) AS BIGINT) % 1000000 + 1) / 1000001.0 AS u, " +
        "CASE WHEN CAST('0x' || substr(md5('dps' || event_type), 1, 13) AS BIGINT) % 2 = 0 " +
        "THEN 1.0 ELSE -1.0 END AS sgn FROM cl) " +
        "SELECT event_type, n_events, n_clipped, n_events - n_clipped AS clip_loss, " +
        "round(sgn * -5.0 * ln(u), 4) AS noise, " +
        "n_clipped + CAST(round(round(sgn * -5.0 * ln(u), 4), 0) AS BIGINT) AS n_dp " +
        "FROM nz ORDER BY event_type"),
    "q_maxsim" ->
      ("WITH t AS (SELECT vec_id // 8 AS doc, vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS q_tok, emb AS q_emb FROM t WHERE doc = 0), " +
        "p AS (SELECT doc, q_tok, " +
        "CAST(round(list_inner_product(emb, q_emb) * 10000, 0) AS BIGINT) AS di " +
        "FROM t CROSS JOIN q WHERE doc >= 1), " +
        "m AS (SELECT doc, q_tok, max(di) AS mx FROM p GROUP BY 1, 2) " +
        "SELECT doc, CAST(sum(mx) AS BIGINT) AS maxsim_e4 FROM m GROUP BY doc " +
        "ORDER BY maxsim_e4 DESC, doc LIMIT 10"),
    "q_l_diversity" ->
      ("WITH b AS (SELECT c_nationkey AS nation, c_mktsegment AS segment, " +
        "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band FROM customer), " +
        "g AS (SELECT nation, segment, band, CAST(count(*) AS BIGINT) AS nb " +
        "FROM b GROUP BY 1, 2, 3) " +
        "SELECT nation, segment, CAST(sum(nb) AS BIGINT) AS k, " +
        "CAST(count(*) AS BIGINT) AS l, " +
        "CAST(count(*) < 2 AS BIGINT) AS violates_l2, " +
        "CAST(count(*) < 3 AS BIGINT) AS violates_l3 " +
        "FROM g GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_t_closeness" ->
      ("WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment, " +
        "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band FROM customer), " +
        "cb AS (SELECT nation, segment, band, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY 1, 2, 3), " +
        "cls AS (SELECT nation, segment, CAST(sum(cnt) AS BIGINT) AS k FROM cb GROUP BY 1, 2), " +
        "gb AS (SELECT band, CAST(count(*) AS BIGINT) AS gcnt FROM c GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS nbands FROM gb), " +
        "grid AS (SELECT cls.nation, cls.segment, cls.k, gb.band, gb.gcnt, tot.n, tot.nbands, " +
        "coalesce(cb.cnt, 0) AS cnt FROM cls CROSS JOIN gb CROSS JOIN tot " +
        "LEFT JOIN cb ON cb.nation = cls.nation AND cb.segment = cls.segment AND cb.band = gb.band), " +
        s"cum AS (SELECT nation, segment, k, nbands, sum((${ppmDivSql("cnt", "k")}) - (${ppmDivSql("gcnt", "n")})) " +
        "OVER (PARTITION BY nation, segment ORDER BY band ROWS UNBOUNDED PRECEDING) AS cum, " +
        "row_number() OVER (PARTITION BY nation, segment ORDER BY band) AS rb FROM grid), " +
        "f AS (SELECT nation, segment, max(k) AS k, " +
        "CAST(sum(CASE WHEN rb < nbands THEN abs(cum) ELSE 0 END) AS BIGINT) AS flow, " +
        "max(nbands) AS nb FROM cum GROUP BY 1, 2) " +
        "SELECT nation, segment, k, " +
        "CAST(CASE WHEN nb <= 1 THEN 0 ELSE flow // (nb - 1) END AS BIGINT) AS t_ppm, " +
        "CAST(CASE WHEN nb <= 1 THEN 0 ELSE flow // (nb - 1) END > 150000 AS BIGINT) AS violates_t15 " +
        "FROM f ORDER BY 1, 2"),
    "q_winnow_fingerprint" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm), " +
        "g4 AS (SELECT doc_id, pos, token || ' ' || lead(token, 1) OVER w || ' ' || " +
        "lead(token, 2) OVER w || ' ' || lead(token, 3) OVER w AS g FROM tok " +
        "WINDOW w AS (PARTITION BY doc_id ORDER BY pos)), " +
        "f AS (SELECT doc_id, CAST(pos - 1 AS BIGINT) AS gpos, " +
        "CAST('0x' || substr(md5(g), 1, 13) AS BIGINT) AS h FROM g4 WHERE g IS NOT NULL), " +
        "m AS (SELECT doc_id, gpos, min(struct_pack(h := h, np := -gpos)) " +
        "OVER (PARTITION BY doc_id ORDER BY gpos ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mn " +
        "FROM f), " +
        "sel AS (SELECT DISTINCT doc_id, struct_extract(mn, 'np') AS np, " +
        "struct_extract(mn, 'h') AS selh FROM m WHERE gpos >= 7), " +
        "ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM f GROUP BY 1), " +
        "fp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, " +
        "CAST(sum(selh) AS BIGINT) AS fp_sum FROM sel GROUP BY 1), " +
        "j AS (SELECT d.doc_id, coalesce(ng.n_grams, 0) AS n_grams, " +
        "coalesce(fp.n_fp, 0) AS n_fp, coalesce(fp.fp_sum, 0) AS fp_sum " +
        "FROM (SELECT doc_id FROM documents) d " +
        "LEFT JOIN ng ON ng.doc_id = d.doc_id LEFT JOIN fp ON fp.doc_id = d.doc_id) " +
        "SELECT doc_id, n_grams, n_fp, fp_sum, " +
        s"CAST(CASE WHEN n_grams = 0 THEN 0 ELSE ${ppmDivSql("n_fp", "n_grams")} END AS BIGINT) AS fp_ppm " +
        "FROM j ORDER BY doc_id"),
    "q_triplet_mine" ->
      ("WITH a AS (SELECT vec_id AS anchor, CAST(label AS BIGINT) AS a_label, " +
        "CAST(embedding AS DOUBLE[]) AS a_emb FROM embeddings WHERE vec_id < 8), " +
        "c AS (SELECT vec_id AS cand, CAST(label AS BIGINT) AS c_label, " +
        "CAST(embedding AS DOUBLE[]) AS c_emb FROM embeddings WHERE vec_id >= 8), " +
        "s AS (SELECT anchor, a_label, cand, c_label, " +
        "CAST(round(list_cosine_similarity(c_emb, a_emb) * 10000, 0) AS BIGINT) AS sim_e4 " +
        "FROM c CROSS JOIN a), " +
        "g AS (SELECT anchor, a_label, " +
        "max(CASE WHEN c_label = a_label THEN struct_pack(sim_e4 := sim_e4, nid := -cand) END) AS p, " +
        "max(CASE WHEN c_label <> a_label THEN struct_pack(sim_e4 := sim_e4, nid := -cand) END) AS n " +
        "FROM s GROUP BY 1, 2) " +
        "SELECT anchor, a_label AS label, " +
        "-struct_extract(p, 'nid') AS pos_id, struct_extract(p, 'sim_e4') AS pos_sim_e4, " +
        "-struct_extract(n, 'nid') AS neg_id, struct_extract(n, 'sim_e4') AS neg_sim_e4, " +
        "struct_extract(p, 'sim_e4') - struct_extract(n, 'sim_e4') AS margin_e4 " +
        "FROM g ORDER BY anchor"),
    "q_preference_pairs" ->
      ("WITH nrm AS (SELECT doc_id, lang, source, " +
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents), " +
        "f AS (SELECT source, lang, doc_id, " +
        "CAST(len(string_split(t, ' ')) AS BIGINT) AS nt, CAST(length(t) AS BIGINT) AS nc, " +
        s"CAST(len(list_filter(string_split(t, ' '), x -> x IN $STOP_SQL)) AS BIGINT) AS sh, " +
        "CAST(length(t) - length(regexp_replace(t, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS pc " +
        "FROM nrm), " +
        "sc AS (SELECT source, lang, doc_id, CASE WHEN nt = 0 OR nc = 0 THEN -1000000 " +
        s"ELSE (${ppmDivSql("sh", "nt")}) - (${ppmDivSql("pc", "nc")}) END AS score FROM f), " +
        "g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "max(struct_pack(score := score, nid := -doc_id)) AS best, " +
        "min(struct_pack(score := score, id := doc_id)) AS worst FROM sc GROUP BY 1, 2) " +
        "SELECT source, lang, n_docs, " +
        "-struct_extract(best, 'nid') AS chosen_id, " +
        "CAST(struct_extract(best, 'score') AS BIGINT) AS chosen_score, " +
        "struct_extract(worst, 'id') AS rejected_id, " +
        "CAST(struct_extract(worst, 'score') AS BIGINT) AS rejected_score, " +
        "CAST(struct_extract(best, 'score') - struct_extract(worst, 'score') AS BIGINT) AS margin " +
        "FROM g WHERE struct_extract(best, 'score') - struct_extract(worst, 'score') >= 1 " +
        "ORDER BY 1, 2"),
    "q_winnow_matches" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm), " +
        "g4 AS (SELECT doc_id, pos, token || ' ' || lead(token, 1) OVER w || ' ' || " +
        "lead(token, 2) OVER w || ' ' || lead(token, 3) OVER w AS g FROM tok " +
        "WINDOW w AS (PARTITION BY doc_id ORDER BY pos)), " +
        "f AS (SELECT doc_id, CAST(pos - 1 AS BIGINT) AS gpos, " +
        "CAST('0x' || substr(md5(g), 1, 13) AS BIGINT) AS h FROM g4 WHERE g IS NOT NULL), " +
        "m AS (SELECT doc_id, gpos, min(struct_pack(h := h, np := -gpos)) " +
        "OVER (PARTITION BY doc_id ORDER BY gpos ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mn " +
        "FROM f), " +
        "sel AS (SELECT DISTINCT doc_id, struct_extract(mn, 'h') AS selh " +
        "FROM m WHERE gpos >= 7), " +
        "keep AS (SELECT selh FROM (SELECT selh, count(*) AS df FROM sel GROUP BY 1) " +
        "WHERE df BETWEEN 2 AND 50), " +
        "k AS (SELECT sel.doc_id, sel.selh FROM sel JOIN keep ON keep.selh = sel.selh) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared " +
        "FROM k a JOIN k b ON a.selh = b.selh AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2"),
    "q_embed_dim_stats" ->
      ("WITH v AS (SELECT CAST(i - 1 AS BIGINT) AS dim, " +
        "CAST(round(CAST(embedding[i] AS DOUBLE) * 10000, 0) AS BIGINT) AS xe4 " +
        "FROM embeddings CROSS JOIN range(1, 65) t(i)), " +
        "g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(xe4) AS BIGINT) AS s1, " +
        "CAST(sum(xe4 * xe4) AS BIGINT) AS s2, min(xe4) AS min_e4, max(xe4) AS max_e4 " +
        "FROM v GROUP BY 1) " +
        "SELECT dim, n, " +
        "CAST((2 * s1 + (CASE WHEN s1 < 0 THEN -1 ELSE 1 END) * n) // (2 * n) AS BIGINT) AS mean_e4, " +
        "CAST((n * s2 - s1 * s1) // (n * n) AS BIGINT) AS var_e8, min_e4, max_e4, " +
        "CAST((n * s2 - s1 * s1) // (n * n) < 1000000 AS BIGINT) AS dead " +
        "FROM g ORDER BY dim"),
    "q_cluster_purity" ->
      ("WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS centroid " +
        "FROM embeddings ORDER BY vec_id LIMIT 8), " +
        "assigned AS (SELECT vec_id, label, cid AS cluster_id FROM (" +
        "SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, c.cid, " +
        "row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_distance(e.embedding::DOUBLE[], c.centroid), c.cid) AS rn " +
        "FROM embeddings e CROSS JOIN cents c) WHERE rn = 1), " +
        "cl AS (SELECT cluster_id, label, CAST(count(*) AS BIGINT) AS nl " +
        "FROM assigned GROUP BY 1, 2), " +
        "g AS (SELECT cluster_id, CAST(sum(nl) AS BIGINT) AS n, " +
        "CAST(count(*) AS BIGINT) AS n_labels, " +
        "max(struct_pack(nl := nl, nlab := -label)) AS m FROM cl GROUP BY 1) " +
        "SELECT cluster_id, n, n_labels, -struct_extract(m, 'nlab') AS majority_label, " +
        "struct_extract(m, 'nl') AS majority_n, " +
        s"CAST(${ppmDivSql("struct_extract(m, 'nl')", "n")} AS BIGINT) AS purity_ppm " +
        "FROM g ORDER BY cluster_id"),
    "q_random_projection" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb " +
        "FROM embeddings WHERE vec_id < 100), " +
        "p AS (SELECT a.vec_id AS va, b.vec_id AS vb, " +
        "list_transform(range(1, 65), i -> a.emb[i] - b.emb[i]) AS dv " +
        "FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id " +
        "WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1), " +
        "sgns AS (SELECT j, list_transform(range(0, 64), i -> " +
        "CASE WHEN CAST('0x' || substr(md5('jl|' || i || '|' || j), 1, 13) AS BIGINT) % 2 = 0 " +
        "THEN 1.0 ELSE -1.0 END) AS sgn FROM range(16) t(j)), " +
        "o AS (SELECT va, vb, dv, " +
        "CAST(round(list_sum(list_transform(dv, x -> x * x)) * 100000000, 0) AS BIGINT) AS od2_e8 " +
        "FROM p), " +
        "d AS (SELECT va, vb, od2_e8, CAST(round(list_sum(list_transform(range(1, 65), " +
        "i -> dv[i] * sgn[i])) * 10000, 0) AS BIGINT) AS pj FROM o CROSS JOIN sgns), " +
        "g AS (SELECT va, vb, od2_e8, CAST(sum(pj * pj) AS BIGINT) AS pd2_e8 " +
        "FROM d GROUP BY 1, 2, 3), " +
        "fin AS (SELECT va, vb, od2_e8, pd2_e8, pd2_e8 // 16 AS pd2n FROM g) " +
        "SELECT va, vb, od2_e8, pd2_e8, " +
        s"CAST(CASE WHEN od2_e8 = 0 THEN 0 ELSE ${ppmDivSql("pd2n", "od2_e8")} END AS BIGINT) AS dist_ppm " +
        "FROM fin ORDER BY va"),
    "q_kl_divergence" ->
      (TP_TOK_CTE +
        ", tfs AS (SELECT source, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2)" +
        ", st AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n_s FROM tfs GROUP BY 1)" +
        ", uni AS (SELECT token, CAST(sum(tf) AS BIGINT) AS ct FROM tfs GROUP BY 1)" +
        ", tt AS (SELECT CAST(sum(ct) AS BIGINT) AS t_tot FROM uni)" +
        ", terms AS (SELECT tfs.source, " +
        "CAST(round((CAST(tf AS DOUBLE) / n_s) * " +
        "ln((CAST(tf AS DOUBLE) / n_s) / (CAST(ct AS DOUBLE) / t_tot)) " +
        "* 1000000000, 0) AS BIGINT) AS term_e9 " +
        "FROM tfs JOIN uni USING (token) JOIN st USING (source) CROSS JOIN tt) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(term_e9) AS BIGINT) AS kl_e9 FROM terms GROUP BY 1 ORDER BY 1"),
    "q_mutual_info" ->
      ("WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS nls " +
        "FROM documents GROUP BY 1, 2), " +
        "nl AS (SELECT lang, CAST(sum(nls) AS BIGINT) AS n_l FROM cells GROUP BY 1), " +
        "nsrc AS (SELECT source, CAST(sum(nls) AS BIGINT) AS n_s FROM cells GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(nls) AS BIGINT) AS n FROM cells), " +
        "hl AS (SELECT CAST(sum(CAST(round(-(CAST(n_l AS DOUBLE) / n) * " +
        "ln(CAST(n_l AS DOUBLE) / n) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS h_lang_e9 " +
        "FROM nl CROSS JOIN tot), " +
        "hs AS (SELECT CAST(sum(CAST(round(-(CAST(n_s AS DOUBLE) / n) * " +
        "ln(CAST(n_s AS DOUBLE) / n) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS h_source_e9 " +
        "FROM nsrc CROSS JOIN tot), " +
        "mi AS (SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS n_cells, " +
        "CAST(sum(CAST(round((CAST(nls AS DOUBLE) / n) * " +
        "ln((CAST(n AS DOUBLE) * nls) / (CAST(n_l AS DOUBLE) * n_s)) " +
        "* 1000000000, 0) AS BIGINT)) AS BIGINT) AS mi_e9 " +
        "FROM cells JOIN nl USING (lang) JOIN nsrc USING (source) CROSS JOIN tot) " +
        "SELECT n, n_cells, mi_e9, h_lang_e9, h_source_e9, " +
        "CAST(CASE WHEN least(h_lang_e9, h_source_e9) <= 0 THEN 0 ELSE " +
        s"${ppmDivSql("mi_e9", "least(h_lang_e9, h_source_e9)")} END AS BIGINT) AS nmi_ppm " +
        "FROM mi CROSS JOIN hl CROSS JOIN hs"),
    "q_js_sources" ->
      (TP_TOK_CTE +
        ", tfs AS (SELECT source, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2)" +
        ", st AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n_s FROM tfs GROUP BY 1)" +
        ", p AS (SELECT source, token, CAST(tf AS DOUBLE) / n_s AS p, " +
        "CAST(round((CAST(tf AS DOUBLE) / n_s) * 1000000000, 0) AS BIGINT) AS p_e9 " +
        "FROM tfs JOIN st USING (source))" +
        ", pr AS (SELECT a.source AS src_a, b.source AS src_b, " +
        "a.p AS pa, b.p AS pb, a.p_e9 AS pae9, b.p_e9 AS pbe9 " +
        "FROM p a JOIN p b ON a.token = b.token AND a.source < b.source)" +
        ", g AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS shared_tokens, " +
        "CAST(sum(CAST(round(0.5 * (pa * ln(2.0 * pa / (pa + pb)) + " +
        "pb * ln(2.0 * pb / (pa + pb))) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS inner_e9, " +
        "CAST(sum(pae9) AS BIGINT) AS sp_a, CAST(sum(pbe9) AS BIGINT) AS sp_b " +
        "FROM pr GROUP BY 1, 2) " +
        "SELECT src_a, src_b, shared_tokens, " +
        "CAST(inner_e9 + CAST(round((2000000000.0 - sp_a - sp_b) * 0.5 * ln(2.0), 0) " +
        "AS BIGINT) AS BIGINT) AS js_e9 FROM g ORDER BY 1, 2"),
    "q_survival_curve" ->
      ("WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS dte FROM orders), " +
        "mx AS (SELECT max(dte) AS maxd FROM o), " +
        "g AS (SELECT o_custkey, dte, lead(dte, 1) OVER " +
        "(PARTITION BY o_custkey ORDER BY dte, o_orderkey) AS nxt FROM o), " +
        "obs AS (SELECT CASE WHEN nxt IS NOT NULL THEN CAST(date_diff('day', dte, nxt) AS BIGINT) " +
        "ELSE CAST(date_diff('day', dte, maxd) AS BIGINT) END AS t, " +
        "CAST(nxt IS NOT NULL AS BIGINT) AS ev FROM g CROSS JOIN mx), " +
        "census AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d_ev, " +
        "CAST(sum(1 - ev) AS BIGINT) AS c_cens, CAST(count(*) AS BIGINT) AS n_at " +
        "FROM obs GROUP BY 1), " +
        "r AS (SELECT *, CAST(sum(n_at) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) " +
        "AS BIGINT) AS n_risk FROM census), " +
        "tm AS (SELECT *, CASE WHEN d_ev = 0 THEN 0 WHEN d_ev >= n_risk THEN 0 " +
        "ELSE CAST(round(ln(1.0 - CAST(d_ev AS DOUBLE) / n_risk) * 1000000000, 0) AS BIGINT) " +
        "END AS term_e9 FROM r), " +
        "fin AS (SELECT *, max(CAST(d_ev = n_risk AS INT)) OVER " +
        "(ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead, " +
        "CAST(sum(term_e9) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_e9 " +
        "FROM tm) " +
        "SELECT t, n_risk, d_ev, c_cens, " +
        "CASE WHEN dead = 1 THEN NULL ELSE cum_e9 END AS logs_e9, " +
        "CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(CAST(cum_e9 AS DOUBLE) / 1000000000.0), 4) " +
        "END AS s_r4 FROM fin ORDER BY t"),
    "q_gini_split" ->
      ("WITH e AS (SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 10000, 0) AS BIGINT) AS x_e4, " +
        "CAST(label < 5 AS BIGINT) AS y FROM embeddings), " +
        "st AS (SELECT min(x_e4) AS xmin, max(x_e4) AS xmax, " +
        "CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos FROM e), " +
        "census AS (SELECT CASE WHEN xmax = xmin THEN 0 " +
        "ELSE least(63, ((x_e4 - xmin) * 64) // (xmax - xmin)) END AS bucket, " +
        "CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b, " +
        "max(xmin) AS xmin, max(xmax) AS xmax, max(n) AS n, max(pos) AS pos " +
        "FROM e CROSS JOIN st GROUP BY 1), " +
        "sc AS (SELECT *, CAST(sum(n_b) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) " +
        "AS BIGINT) AS n_left, CAST(sum(pos_b) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) " +
        "AS BIGINT) AS pos_left FROM census), " +
        "f AS (SELECT CAST(bucket AS BIGINT) AS bucket, " +
        "CAST(xmin + ((bucket + 1) * (xmax - xmin)) // 64 AS BIGINT) AS thr_e4, " +
        "n_left, pos_left, n, pos, " +
        "CAST(round(((n_left - (CAST(pos_left AS DOUBLE) * pos_left + " +
        "CAST(n_left - pos_left AS DOUBLE) * (n_left - pos_left)) / n_left) + " +
        "((n - n_left) - (CAST(pos - pos_left AS DOUBLE) * (pos - pos_left) + " +
        "CAST((n - n_left) - (pos - pos_left) AS DOUBLE) * ((n - n_left) - (pos - pos_left))) " +
        "/ (n - n_left))) / n * 1000000000, 0) AS BIGINT) AS wgini_e9 " +
        "FROM sc WHERE n_left < n), " +
        "b AS (SELECT min(struct_pack(wgini_e9 := wgini_e9, bucket := bucket)) AS m FROM f) " +
        "SELECT bucket, thr_e4, n_left, pos_left, wgini_e9, " +
        "CAST(bucket = struct_extract(m, 'bucket') AS BIGINT) AS is_best " +
        "FROM f CROSS JOIN b ORDER BY bucket"),
    "q_psi_drift" ->
      ("WITH ev AS (SELECT ts, value FROM events WHERE value IS NOT NULL), " +
        "st AS (SELECT min(value) AS vmin, max(value) AS vmax, min(ts) AS t0 FROM ev), " +
        "c AS (SELECT CASE WHEN vmax = vmin THEN 0 ELSE least(9, " +
        "CAST(floor((value - vmin) * 10.0 / (vmax - vmin)) AS BIGINT)) END AS bin, " +
        "CAST(ts < t0 + INTERVAL 7 DAY AS BIGINT) AS is_ref FROM ev CROSS JOIN st), " +
        "census AS (SELECT bin, CAST(sum(is_ref) AS BIGINT) AS ref_n, " +
        "CAST(sum(1 - is_ref) AS BIGINT) AS cur_n FROM c GROUP BY 1), " +
        "grid AS (SELECT CAST(g.bin AS BIGINT) AS bin, coalesce(ref_n, 0) AS ref_n, " +
        "coalesce(cur_n, 0) AS cur_n FROM range(10) g(bin) " +
        "LEFT JOIN census ON census.bin = g.bin), " +
        "tot AS (SELECT CAST(sum(ref_n) AS BIGINT) AS rt, CAST(sum(cur_n) AS BIGINT) AS ct " +
        "FROM grid) " +
        "SELECT bin, ref_n, cur_n, " +
        s"CAST(${ppmDivSql("(ref_n + 1)", "(rt + 10)")} AS BIGINT) AS ref_ppm, " +
        s"CAST(${ppmDivSql("(cur_n + 1)", "(ct + 10)")} AS BIGINT) AS cur_ppm, " +
        "CAST(round((CAST(ref_n + 1 AS DOUBLE) / (rt + 10) - " +
        "CAST(cur_n + 1 AS DOUBLE) / (ct + 10)) * " +
        "ln((CAST(ref_n + 1 AS DOUBLE) / (rt + 10)) / " +
        "(CAST(cur_n + 1 AS DOUBLE) / (ct + 10))) * 1000000000, 0) AS BIGINT) AS term_e9 " +
        "FROM grid CROSS JOIN tot ORDER BY bin"),
    "q_bootstrap_ci" ->
      ("WITH ev AS (SELECT event_id, CAST(round(value * 10000, 0) AS BIGINT) AS ve4 " +
        "FROM events WHERE value IS NOT NULL), " +
        "dg AS (SELECT event_id, ve4, CAST(g AS BIGINT) AS g, " +
        "md5(CAST(event_id AS VARCHAR) || '#' || CAST(g AS VARCHAR)) AS dig " +
        "FROM ev CROSS JOIN range(8) t(g)), " +
        "ku AS (SELECT g * 8 + CAST(sl AS BIGINT) AS b, ve4, " +
        "(CAST('0x' || substr(dig, CAST(sl AS BIGINT) * 4 + 1, 4) AS BIGINT) + 0.5) / 65536.0 AS u " +
        "FROM dg CROSS JOIN range(8) t2(sl)), " +
        "kk AS (SELECT b, ve4, CASE WHEN u < 0.36787944117144233 THEN 0 " +
        "WHEN u < 0.7357588823428847 THEN 1 WHEN u < 0.9196986029286058 THEN 2 " +
        "WHEN u < 0.9810118431238462 THEN 3 WHEN u < 0.9963401531726563 THEN 4 " +
        "WHEN u < 0.9994058151824183 THEN 5 ELSE 6 END AS k FROM ku), " +
        "g AS (SELECT b, CAST(sum(k) AS BIGINT) AS n_b, CAST(sum(ve4 * k) AS BIGINT) AS s_b " +
        "FROM kk GROUP BY 1), " +
        s"m AS (SELECT b, CAST(CASE WHEN n_b = 0 THEN 0 ELSE ${roundDivSql("s_b", "n_b", 1L)} END " +
        "AS BIGINT) AS mean_b FROM g), " +
        "rk AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) AS rn FROM m), " +
        "ci AS (SELECT max(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo_e4, " +
        "max(CASE WHEN rn = 63 THEN mean_b END) AS ci_hi_e4 FROM rk), " +
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        s"CAST(${roundDivSql("sum(ve4)", "count(*)", 1L)} AS BIGINT) AS mean_e4 FROM ev) " +
        "SELECT n, mean_e4, ci_lo_e4, ci_hi_e4 FROM tot CROSS JOIN ci"),
    "q_seasonal_decompose" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dte, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y_c " +
        "FROM orders GROUP BY 1), " +
        "t AS (SELECT dte, y_c, count(*) OVER w AS ma_n, " +
        "CAST(sum(y_c) OVER w AS BIGINT) AS ma_s, CAST(isodow(dte) AS BIGINT) AS dow " +
        "FROM daily WINDOW w AS (ORDER BY dte ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
        s"tr AS (SELECT dte, y_c, dow, CASE WHEN ma_n = 7 THEN CAST(${roundDivSql("ma_s", "7", 1L)} " +
        "AS BIGINT) END AS trend_c FROM t), " +
        "se AS (SELECT dow, CAST((2 * sum(y_c - trend_c) + " +
        "(CASE WHEN sum(y_c - trend_c) < 0 THEN -1 ELSE 1 END) * count(*)) // (2 * count(*)) " +
        "AS BIGINT) AS seasonal_c FROM tr WHERE trend_c IS NOT NULL GROUP BY 1) " +
        "SELECT tr.dte, tr.y_c, tr.trend_c, tr.dow, se.seasonal_c, " +
        "tr.y_c - tr.trend_c - se.seasonal_c AS resid_c " +
        "FROM tr LEFT JOIN se ON se.dow = tr.dow ORDER BY tr.dte"),
    "q_mmr_rerank" -> mmrOracleSql,
    "q_topk_churn" ->
      ("WITH rev AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, " +
        "l_partkey AS part, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) " +
        "AS BIGINT) AS rev_c FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY 1, 2), " +
        "top AS (SELECT month, part FROM (SELECT month, part, row_number() OVER " +
        "(PARTITION BY month ORDER BY rev_c DESC, part) AS rk FROM rev) WHERE rk <= 10), " +
        "sizes AS (SELECT month, CAST(count(*) AS BIGINT) AS n_list FROM top GROUP BY 1), " +
        "months AS (SELECT DISTINCT month FROM rev), " +
        "consec AS (SELECT m1.month, CAST(m1.month + INTERVAL 1 MONTH AS DATE) AS next_month " +
        "FROM months m1 JOIN months m2 ON m2.month = CAST(m1.month + INTERVAL 1 MONTH AS DATE)), " +
        "common AS (SELECT CAST(t2.month - INTERVAL 1 MONTH AS DATE) AS month, " +
        "CAST(count(*) AS BIGINT) AS n_common FROM top t1 JOIN top t2 " +
        "ON t2.month = CAST(t1.month + INTERVAL 1 MONTH AS DATE) AND t2.part = t1.part " +
        "GROUP BY 1), " +
        "j AS (SELECT c.month, c.next_month, sa.n_list AS n_a, sb.n_list AS n_b, " +
        "coalesce(common.n_common, 0) AS n_common " +
        "FROM consec c JOIN sizes sa ON sa.month = c.month " +
        "JOIN sizes sb ON sb.month = c.next_month " +
        "LEFT JOIN common ON common.month = c.month) " +
        "SELECT month, next_month, n_common, " +
        s"CAST(${ppmDivSql("n_common", "(n_a + n_b - n_common)")} AS BIGINT) AS jaccard_ppm " +
        "FROM j ORDER BY month"),
    "q_hll_distinct" ->
      ("WITH hv AS (SELECT DISTINCT event_type, " +
        "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM events), " +
        "r AS (SELECT event_type, h // 18014398509481984 AS bucket, " +
        "h % 18014398509481984 AS rem FROM hv), " +
        "regs AS (SELECT event_type, bucket, CAST(max(CASE WHEN rem = 0 THEN 55 " +
        "ELSE 55 - length(bin(rem)) END) AS BIGINT) AS reg FROM r GROUP BY 1, 2), " +
        "sk AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_full, " +
        "CAST(sum(CAST(1 AS BIGINT) << CAST(55 - reg AS INT)) AS BIGINT) AS s_full " +
        "FROM regs GROUP BY 1), " +
        "sv AS (SELECT event_type, s_full + (64 - n_full) * 36028797018963968 AS s_inv, " +
        "64 - n_full AS zeros FROM sk), " +
        "est AS (SELECT event_type, zeros, " +
        // keep every factor DOUBLE: DuckDB parses bare decimal literals as
        // DECIMAL and overflows the 2^55 product in decimal arithmetic
        "CAST(0.709 AS DOUBLE) * 4096.0 * CAST(36028797018963968 AS DOUBLE) " +
        "/ CAST(s_inv AS DOUBLE) AS est_raw FROM sv), " +
        "hll AS (SELECT event_type, CAST(round(CASE WHEN est_raw <= 2.5 * 64 AND zeros > 0 " +
        "THEN 64 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE est_raw END, 0) AS BIGINT) AS n_hll " +
        "FROM est), " +
        "ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM " +
        "(SELECT DISTINCT event_type, user_id FROM events) GROUP BY 1) " +
        "SELECT hll.event_type, n_exact, n_hll, " +
        "(abs(n_hll - n_exact) * 1000000) // n_exact AS err_ppm " +
        "FROM hll JOIN ex ON ex.event_type = hll.event_type ORDER BY hll.event_type"),
    "q_lm_perplexity" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm WHERE t <> '')" +
        ", bg AS (SELECT doc_id, token AS w1, token || ' ' || lead(token, 1) OVER " +
        "(PARTITION BY doc_id ORDER BY pos) AS shingle FROM tok)" +
        ", bgv AS (SELECT doc_id, w1, shingle FROM bg WHERE shingle IS NOT NULL)" +
        ", bgc AS (SELECT shingle, CAST(count(*) AS BIGINT) AS c_bg FROM bgv GROUP BY 1)" +
        ", ctx AS (SELECT split_part(shingle, ' ', 1) AS w1, CAST(sum(c_bg) AS BIGINT) " +
        "AS c_ctx FROM bgc GROUP BY 1)" +
        ", voc AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM tok)" +
        ", terms AS (SELECT doc_id, CAST(round((ln(CAST(c_ctx + v AS DOUBLE)) - " +
        "ln(CAST(c_bg + 1 AS DOUBLE))) * 1000000000, 0) AS BIGINT) AS nll_e9 " +
        "FROM bgv JOIN bgc USING (shingle) JOIN ctx ON ctx.w1 = bgv.w1 CROSS JOIN voc)" +
        ", agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "CAST(sum(nll_e9) AS BIGINT) AS se9 FROM terms GROUP BY 1) " +
        s"SELECT doc_id, n_bigrams, CAST(${roundDivSql("se9", "n_bigrams", 1L)} AS BIGINT) " +
        "AS avg_nll_e9, " +
        s"round(exp(CAST(${roundDivSql("se9", "n_bigrams", 1L)} AS DOUBLE) / 1000000000.0), 4) " +
        "AS ppl_r4 FROM agg ORDER BY doc_id"),
    "q_brier_calibration" ->
      ("WITH e AS (SELECT CAST(round(1.0 / (1.0 + exp(-CAST(embedding[1] AS DOUBLE))) " +
        "* 10000, 0) AS BIGINT) AS p_e4, CAST(label < 5 AS BIGINT) AS y FROM embeddings), " +
        "census AS (SELECT least(9, p_e4 // 1000) AS bin, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(p_e4) AS BIGINT) AS sp, CAST(sum(y) AS BIGINT) AS pos, " +
        "CAST(sum((p_e4 - y * 10000) * (p_e4 - y * 10000)) AS BIGINT) AS brier_e8 " +
        "FROM e GROUP BY 1), " +
        "g AS (SELECT CAST(t.bin AS BIGINT) AS bin, coalesce(n, 0) AS n, " +
        s"CASE WHEN n IS NULL THEN 0 ELSE CAST(${roundDivSql("sp", "n", 1L)} AS BIGINT) END " +
        "AS mean_p_e4, " +
        s"CASE WHEN n IS NULL THEN 0 ELSE CAST(${ppmDivSql("pos", "n")} AS BIGINT) END " +
        "AS rate_ppm, coalesce(brier_e8, 0) AS brier_e8 " +
        "FROM range(10) t(bin) LEFT JOIN census ON census.bin = t.bin) " +
        "SELECT bin, n, mean_p_e4, rate_ppm, brier_e8, " +
        "abs(mean_p_e4 - (rate_ppm // 100)) AS gap_e4 FROM g ORDER BY bin"),
    "q_pca_power" ->
      ("WITH m AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x, " +
        "generate_subscripts(embedding, 1) AS dd FROM embeddings), " +
        "e AS (SELECT vec_id, CAST(dd AS BIGINT) - 1 AS d, " +
        "CAST(round(x * 10000, 0) AS BIGINT) AS xe4 FROM m), " +
        "mu AS (SELECT d, CAST(sum(xe4) AS BIGINT) AS sx, CAST(count(*) AS BIGINT) AS n " +
        "FROM e GROUP BY 1), " +
        "mue AS (SELECT d, (2 * sx + (CASE WHEN sx < 0 THEN -1 ELSE 1 END) * n) // (2 * n) " +
        "AS mu_e4 FROM mu), " +
        "sg AS (SELECT d, CASE WHEN CAST('0x' || substr(md5('pca|' || CAST(d AS VARCHAR)), " +
        "1, 13) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM mue), " +
        "c AS (SELECT vec_id, e.d, xe4 - mu_e4 AS c FROM e JOIN mue ON mue.d = e.d), " +
        "s AS (SELECT vec_id, CAST(sum(c * sgn) AS BIGINT) AS s_r FROM c " +
        "JOIN sg ON sg.d = c.d GROUP BY 1), " +
        "w AS (SELECT d, CAST(sum(c * s_r) AS BIGINT) AS w_num, " +
        "CAST(count(*) AS BIGINT) AS n FROM c JOIN s USING (vec_id) GROUP BY 1) " +
        "SELECT d, w_num, (2 * w_num + (CASE WHEN w_num < 0 THEN -1 ELSE 1 END) * n) " +
        "// (2 * n) AS w_e8, " +
        "round(CAST((2 * w_num + (CASE WHEN w_num < 0 THEN -1 ELSE 1 END) * n) // (2 * n) " +
        "AS DOUBLE) / 100000000.0, 4) AS w_r4 FROM w ORDER BY d"),
    "q_watermark_fit" ->
      ("WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events), " +
        "lt AS (SELECT greatest(0, coalesce(max(ts_us) OVER (PARTITION BY user_id " +
        "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_us, 0)) " +
        "AS late_us FROM ev), " +
        "b AS (SELECT CASE WHEN late_us = 0 THEN 0 WHEN late_us <= 60000000 THEN 1 " +
        "WHEN late_us <= 300000000 THEN 2 WHEN late_us <= 900000000 THEN 3 " +
        "WHEN late_us <= 3600000000 THEN 4 ELSE 5 END AS bucket FROM lt), " +
        "census AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1), " +
        "grid AS (SELECT CAST(g.bucket AS BIGINT) AS bucket, coalesce(n, 0) AS n " +
        "FROM range(6) g(bucket) LEFT JOIN census ON census.bucket = g.bucket), " +
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM grid), " +
        "cum AS (SELECT bucket, n, CAST(sum(n) OVER (ORDER BY bucket " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n " +
        "FROM grid) " +
        "SELECT bucket, n, cum_n, " +
        s"CAST(${ppmDivSql("cum_n", "t")} AS BIGINT) AS cum_ppm " +
        "FROM cum CROSS JOIN tot ORDER BY bucket"),
    "q_oov_rate" ->
      (NORM_CTE +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token FROM norm WHERE t <> '')" +
        ", voc AS (SELECT token FROM (SELECT token, count(*) AS c FROM tok GROUP BY 1 " +
        "ORDER BY c DESC, token LIMIT 1000))" +
        ", pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(CASE WHEN voc.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov " +
        "FROM tok LEFT JOIN voc ON voc.token = tok.token GROUP BY 1) " +
        "SELECT doc_id, n_tokens, n_oov, " +
        s"CAST(${ppmDivSql("n_oov", "n_tokens")} AS BIGINT) AS oov_ppm " +
        "FROM pd ORDER BY doc_id"),
    "q_bpe_apply" ->
      (NORM_CTE +
        ", tok AS (SELECT unnest(string_split(t, ' ')) AS token FROM norm WHERE t <> '')" +
        ", wc AS (SELECT token AS word, CAST(count(*) AS BIGINT) AS wf FROM tok " +
        "WHERE length(token) >= 2 GROUP BY 1)" +
        ", pr AS (SELECT wf, unnest(list_transform(range(length(word) - 1), " +
        "i -> substr(word, CAST(i + 1 AS INT), 2))) AS pair FROM wc)" +
        ", best AS (SELECT substr(pair, 1, 1) AS c1, substr(pair, 2, 1) AS c2 FROM " +
        "(SELECT pair, CAST(sum(wf) AS BIGINT) AS weight FROM pr GROUP BY 1 " +
        "ORDER BY weight DESC, pair LIMIT 1))" +
        ", mg AS (SELECT wf, string_split(replace(array_to_string(string_split(word, ''), ' '), " +
        "c1 || ' ' || c2, c1 || c2), ' ') AS syms FROM wc CROSS JOIN best)" +
        ", p2 AS (SELECT wf, unnest(list_transform(range(len(syms) - 1), " +
        "i -> syms[CAST(i + 1 AS INT)] || '|' || syms[CAST(i + 2 AS INT)])) AS pair " +
        "FROM mg WHERE len(syms) >= 2) " +
        "SELECT pair, CAST(sum(wf) AS BIGINT) AS weight FROM p2 GROUP BY 1 " +
        "ORDER BY weight DESC, pair LIMIT 20"),
    "q_link_predict" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "adj AS (SELECT pa AS w, pb AS x FROM e UNION ALL SELECT pb, pa FROM e), " +
        "cd AS (SELECT w FROM (SELECT w, count(*) AS dw FROM adj GROUP BY 1) WHERE dw <= 50), " +
        "el AS (SELECT adj.w, adj.x FROM adj JOIN cd USING (w)), " +
        "degc AS (SELECT x, CAST(count(*) AS BIGINT) AS degc FROM el GROUP BY 1), " +
        "cand AS (SELECT a.x AS xa, b.x AS xb, CAST(count(*) AS BIGINT) AS common " +
        "FROM el a JOIN el b ON a.w = b.w AND a.x < b.x GROUP BY 1, 2), " +
        "ne AS (SELECT cand.* FROM cand LEFT JOIN e ON e.pa = cand.xa AND e.pb = cand.xb " +
        "WHERE e.pa IS NULL), " +
        "sc AS (SELECT xa, xb, common, da.degc AS da, db.degc AS db FROM ne " +
        "JOIN degc da ON da.x = ne.xa JOIN degc db ON db.x = ne.xb) " +
        "SELECT xa, xb, common, " +
        s"CAST(${ppmDivSql("common", "(da + db - common)")} AS BIGINT) AS jaccard_ppm " +
        "FROM sc ORDER BY jaccard_ppm DESC, xa, xb LIMIT 50"),
    "q_isotonic_calibrate" ->
      ("WITH e AS (SELECT CAST(round(1.0 / (1.0 + exp(-4.0 * CAST(embedding[1] AS DOUBLE))) " +
        "* 10000, 0) AS BIGINT) AS p_e4, CAST(label < 5 AS BIGINT) AS y FROM embeddings), " +
        "bins AS (SELECT least(9, p_e4 // 1000) AS bin, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(y) AS BIGINT) AS pos FROM e GROUP BY 1), " +
        "cum AS (SELECT bin, n, pos, CAST(sum(n) OVER (ORDER BY bin " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn, " +
        "CAST(sum(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp " +
        "FROM bins), " +
        "pairs AS (SELECT j.bin AS j, k.bin AS k, k.cp - j.cp + j.pos AS pp, " +
        "k.cn - j.cn + j.n AS nn FROM cum j JOIN cum k ON j.bin <= k.bin), " +
        s"pr AS (SELECT j, k, CAST(${ppmDivSql("pp", "nn")} AS BIGINT) AS ratio_ppm " +
        "FROM pairs), " +
        "f1 AS (SELECT i.bin AS i, pr.j, min(ratio_ppm) AS mn FROM bins i " +
        "JOIN pr ON pr.j <= i.bin AND pr.k >= i.bin GROUP BY 1, 2), " +
        "fit AS (SELECT i, CAST(max(mn) AS BIGINT) AS iso_ppm FROM f1 GROUP BY 1) " +
        "SELECT bins.bin, n, " +
        s"CAST(${ppmDivSql("pos", "n")} AS BIGINT) AS rate_ppm, iso_ppm " +
        "FROM bins JOIN fit ON fit.i = bins.bin ORDER BY bin"),
    "q_er_weights" ->
      ("WITH c AS (SELECT c_custkey AS id, c_custkey // 50 AS blk, " +
        "c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat, " +
        "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band FROM customer), " +
        "nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM c), " +
        "useg AS (SELECT CAST(" + ppmDivSql("s2", "(nt * nt)") + " AS BIGINT) AS u FROM " +
        "(SELECT CAST(sum(f * f) AS BIGINT) AS s2 FROM " +
        "(SELECT CAST(count(*) AS BIGINT) AS f FROM c GROUP BY seg)) CROSS JOIN nt), " +
        "unat AS (SELECT CAST(" + ppmDivSql("s2", "(nt * nt)") + " AS BIGINT) AS u FROM " +
        "(SELECT CAST(sum(f * f) AS BIGINT) AS s2 FROM " +
        "(SELECT CAST(count(*) AS BIGINT) AS f FROM c GROUP BY nat)) CROSS JOIN nt), " +
        "uband AS (SELECT CAST(" + ppmDivSql("s2", "(nt * nt)") + " AS BIGINT) AS u FROM " +
        "(SELECT CAST(sum(f * f) AS BIGINT) AS s2 FROM " +
        "(SELECT CAST(count(*) AS BIGINT) AS f FROM c GROUP BY band)) CROSS JOIN nt), " +
        "w AS (SELECT " +
        "CAST(round(ln(0.9 / (CAST(greatest(least(useg.u, 999999), 1) AS DOUBLE) / 1000000.0)) * 1000000000, 0) AS BIGINT) AS wa_seg, " +
        "CAST(round(ln(0.1 / (1.0 - CAST(greatest(least(useg.u, 999999), 1) AS DOUBLE) / 1000000.0)) * 1000000000, 0) AS BIGINT) AS wd_seg, " +
        "CAST(round(ln(0.9 / (CAST(greatest(least(unat.u, 999999), 1) AS DOUBLE) / 1000000.0)) * 1000000000, 0) AS BIGINT) AS wa_nat, " +
        "CAST(round(ln(0.1 / (1.0 - CAST(greatest(least(unat.u, 999999), 1) AS DOUBLE) / 1000000.0)) * 1000000000, 0) AS BIGINT) AS wd_nat, " +
        "CAST(round(ln(0.9 / (CAST(greatest(least(uband.u, 999999), 1) AS DOUBLE) / 1000000.0)) * 1000000000, 0) AS BIGINT) AS wa_band, " +
        "CAST(round(ln(0.1 / (1.0 - CAST(greatest(least(uband.u, 999999), 1) AS DOUBLE) / 1000000.0)) * 1000000000, 0) AS BIGINT) AS wd_band " +
        "FROM useg CROSS JOIN unat CROSS JOIN uband), " +
        "sizes AS (SELECT blk FROM (SELECT blk, count(*) AS bn FROM c GROUP BY 1) " +
        "WHERE bn BETWEEN 2 AND 100), " +
        "bl AS (SELECT c.* FROM c JOIN sizes USING (blk)), " +
        "p AS (SELECT a.id AS id_a, b.id AS id_b, a.seg = b.seg AS ag_seg, " +
        "a.nat = b.nat AS ag_nat, a.band = b.band AS ag_band " +
        "FROM bl a JOIN bl b ON a.blk = b.blk AND a.id < b.id) " +
        "SELECT id_a, id_b, " +
        "(CASE WHEN ag_seg THEN wa_seg ELSE wd_seg END) + " +
        "(CASE WHEN ag_nat THEN wa_nat ELSE wd_nat END) + " +
        "(CASE WHEN ag_band THEN wa_band ELSE wd_band END) AS score_e9 " +
        "FROM p CROSS JOIN w ORDER BY score_e9 DESC, id_a, id_b LIMIT 50"),
    "q_running_topk" ->
      ("WITH ev AS (SELECT user_id, event_id, CAST(round(value * 100, 0) AS BIGINT) " +
        "AS cents FROM events WHERE value IS NOT NULL), " +
        "r AS (SELECT user_id, cents, CAST(row_number() OVER (PARTITION BY user_id " +
        "ORDER BY cents DESC, event_id) AS BIGINT) AS rank FROM ev) " +
        "SELECT user_id, rank, cents FROM r WHERE rank <= 3 ORDER BY user_id, rank"),
    "q_neyman_alloc" ->
      ("WITH st AS (SELECT c_mktsegment AS stratum, CAST(count(*) AS BIGINT) AS n_h, " +
        "CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sx, " +
        "CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT) * " +
        "CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sx2 " +
        "FROM customer GROUP BY 1), " +
        "wgt AS (SELECT stratum, n_h, " +
        "CAST(round(sqrt(CAST(sx2 AS DOUBLE) / CAST(n_h AS DOUBLE) - " +
        "(CAST(sx AS DOUBLE) / CAST(n_h AS DOUBLE)) * " +
        "(CAST(sx AS DOUBLE) / CAST(n_h AS DOUBLE))) * " +
        "CAST(n_h AS DOUBLE) * 10000.0, 0) AS BIGINT) AS w_e4 FROM st), " +
        "tot AS (SELECT CAST(sum(w_e4) AS BIGINT) AS wt FROM wgt), " +
        "q AS (SELECT stratum, n_h, w_e4, (w_e4 * 1000) // wt AS base, " +
        "(w_e4 * 1000) % wt AS rem FROM wgt CROSS JOIN tot), " +
        "sh AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS left1 FROM q), " +
        "rk AS (SELECT q.*, CAST(row_number() OVER (ORDER BY rem DESC, stratum) AS BIGINT) " +
        "AS rk FROM q) " +
        "SELECT stratum, n_h, w_e4, base, " +
        "base + (CASE WHEN rk <= left1 THEN 1 ELSE 0 END) AS alloc " +
        "FROM rk CROSS JOIN sh ORDER BY stratum"),
    "q_naive_forecast" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dte, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS a_c " +
        "FROM orders GROUP BY 1), " +
        "lg AS (SELECT dte, a_c, lag(a_c, 7) OVER (ORDER BY dte) AS f_c, " +
        "lag(dte, 7) OVER (ORDER BY dte) AS dlag FROM daily), " +
        "bt AS (SELECT CAST(isodow(dte) AS BIGINT) AS isodow, a_c, f_c, " +
        "abs(a_c - f_c) AS ae_c, " +
        s"CAST(${ppmDivSql("abs(a_c - f_c)", "a_c")} AS BIGINT) AS ape_ppm " +
        "FROM lg WHERE f_c IS NOT NULL AND dlag + INTERVAL 7 DAY = dte), " +
        "g AS (SELECT isodow, CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(ae_c) AS BIGINT) AS sum_ae_c, CAST(sum(a_c - f_c) AS BIGINT) AS bias_c, " +
        "CAST(sum(ape_ppm) AS BIGINT) AS sum_ape FROM bt GROUP BY 1) " +
        "SELECT isodow, n_days, sum_ae_c, bias_c, " +
        s"CAST(${roundDivSql("sum_ape", "n_days", 1L)} AS BIGINT) AS mape_ppm " +
        "FROM g ORDER BY isodow"),
    "q_freshness_decay" ->
      ("WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events), " +
        "mx AS (SELECT CAST(max(ts_us) AS BIGINT) AS tmax FROM ev), " +
        "t AS (SELECT event_type, CAST(round(exp(-CAST(tmax - ts_us AS DOUBLE) " +
        "/ 604800000000.0) * 1000000000, 0) AS BIGINT) AS w_e9 FROM ev CROSS JOIN mx), " +
        "g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(w_e9) AS BIGINT) AS decayed_e9 FROM t GROUP BY 1) " +
        "SELECT event_type, n, decayed_e9, " +
        s"CAST(${ppmDivSql("decayed_e9", "(n * 1000000000)")} AS BIGINT) AS fresh_ppm " +
        "FROM g ORDER BY event_type"),
    "q_ipf_raking" -> ipfOracleSql,
    "q_markov_attribution" -> markovOracleSql,
    "q_temperature_fit" ->
      ("WITH cells AS (SELECT CAST(embedding[1] AS DOUBLE) AS x, " +
        "CAST(label < 5 AS BIGINT) AS y FROM embeddings), " +
        "grid AS (SELECT CAST(g.i + 5 AS BIGINT) AS tau_e1 FROM range(16) g(i)), " +
        "terms AS (SELECT tau_e1, CAST(round(-(CAST(y AS DOUBLE) * " +
        "ln(1.0 / (1.0 + exp(-4.0 * x / (CAST(tau_e1 AS DOUBLE) / 10.0)))) + " +
        "(1.0 - CAST(y AS DOUBLE)) * ln(1.0 - 1.0 / (1.0 + exp(-4.0 * x " +
        "/ (CAST(tau_e1 AS DOUBLE) / 10.0))))) * 1000000000, 0) AS BIGINT) AS nll_e9 " +
        "FROM cells CROSS JOIN grid), " +
        "bt AS (SELECT tau_e1, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(nll_e9) AS BIGINT) AS nll_sum_e9 FROM terms GROUP BY 1), " +
        "best AS (SELECT struct_extract(min(struct_pack(nll_sum_e9 := nll_sum_e9, " +
        "tau_e1 := tau_e1)), 'tau_e1') AS best_tau FROM bt) " +
        "SELECT tau_e1, n, nll_sum_e9, CAST(tau_e1 = best_tau AS BIGINT) AS is_best " +
        "FROM bt CROSS JOIN best ORDER BY tau_e1"),
    "q_part_top_shipments" ->
      ("WITH li AS (SELECT l_partkey AS part, " +
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents, " +
        "l_orderkey * 10 + l_linenumber AS rid FROM lineitem), " +
        "r AS (SELECT part, cents, rid, CAST(row_number() OVER (PARTITION BY part " +
        "ORDER BY cents DESC, rid) AS BIGINT) AS rank FROM li) " +
        "SELECT part, rank, cents, rid FROM r WHERE rank <= 3 ORDER BY part, rank"),
    "q_jaro_er" ->
      ("WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts, " +
        "string_split(p_name, ' ')[-1] AS noun FROM part GROUP BY 1), " +
        "p AS (SELECT a.p_name AS name_a, b.p_name AS name_b, " +
        "a.n_parts AS n_a, b.n_parts AS n_b, " +
        "CAST(round(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000000, 0) " +
        "AS BIGINT) AS jw_e9 FROM n a JOIN n b ON a.noun = b.noun " +
        "AND a.p_name < b.p_name) " +
        "SELECT name_a, name_b, n_a, n_b, jw_e9 FROM p WHERE jw_e9 >= 800000000 " +
        "ORDER BY jw_e9 DESC, name_a, name_b"),
    "q_shapley_attribution" ->
      ("WITH u AS (SELECT user_id, CAST(bit_or(CASE event_type " +
        "WHEN 'click' THEN 1 WHEN 'error' THEN 2 WHEN 'signup' THEN 4 " +
        "WHEN 'view' THEN 8 ELSE 0 END) AS BIGINT) AS mask, " +
        "CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS conv FROM events GROUP BY 1), " +
        "mc AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS conv_n FROM u GROUP BY 1), " +
        "v AS (SELECT g.s, CAST(coalesce(sum(mc.conv_n), 0) AS BIGINT) AS v " +
        "FROM (SELECT CAST(i AS BIGINT) AS s FROM range(16) t(i)) g " +
        "LEFT JOIN mc ON (mc.mask & g.s) = mc.mask GROUP BY 1), " +
        "ch AS (SELECT CAST(i AS BIGINT) AS i, CASE i WHEN 0 THEN 'click' " +
        "WHEN 1 THEN 'error' WHEN 2 THEN 'signup' ELSE 'view' END AS channel " +
        "FROM range(4) t(i)), " +
        "phi AS (SELECT ch.channel, CAST(sum((CASE WHEN bit_count(lo.s) IN (0, 3) " +
        "THEN 6 ELSE 2 END) * (hi.v - lo.v)) AS BIGINT) AS phi_x24 " +
        "FROM ch JOIN v lo ON ((lo.s >> i) & 1) = 0 " +
        "JOIN v hi ON hi.s = (lo.s | (1 << i)) GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(CASE WHEN s = 15 THEN v WHEN s = 0 THEN -v " +
        "ELSE 0 END) * 24 AS BIGINT) AS tot_x24 FROM v) " +
        "SELECT channel, phi_x24, CASE WHEN tot_x24 = 0 THEN 0 ELSE " +
        s"CAST(${ppmDivSql("phi_x24", "tot_x24")} AS BIGINT) END AS share_ppm " +
        "FROM phi CROSS JOIN tot ORDER BY channel"),
    "q_frequent_triples" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem), " +
        "tri AS (SELECT a.p AS pa, b.p AS pb, c.p AS pc, " +
        "CAST(count(*) AS BIGINT) AS supp FROM op a " +
        "JOIN op b ON a.k = b.k AND a.p < b.p " +
        "JOIN op c ON b.k = c.k AND b.p < c.p GROUP BY 1, 2, 3) " +
        "SELECT pa, pb, pc, supp FROM tri WHERE supp >= 2 ORDER BY pa, pb, pc"),
    "q_cuped" ->
      ("WITH u AS (SELECT user_id % 2 AS arm, user_id, " +
        "CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN " +
        "CAST(round(value * 1000, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x, " +
        "CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN " +
        "CAST(round(value * 1000, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y " +
        "FROM events GROUP BY 1, 2), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx, " +
        "sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy, " +
        "sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy FROM u), " +
        "c AS (SELECT CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * " +
        "CAST(sx AS HUGEINT) AS cxx, CAST(n AS HUGEINT) * sxy - " +
        "CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS cxy, " +
        "CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) " +
        "AS cyy FROM m), " +
        "p AS (SELECT CASE WHEN cxx = 0 THEN 0 ELSE CAST(round(CAST(cxy AS DOUBLE) " +
        "/ CAST(cxx AS DOUBLE) * 1000000000, 0) AS BIGINT) END AS theta_e9, " +
        "CASE WHEN cxx = 0 OR cyy = 0 THEN 0 ELSE CAST(round(CAST(cxy AS DOUBLE) " +
        "* CAST(cxy AS DOUBLE) / (CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)) " +
        "* 1000000, 0) AS BIGINT) END AS varred_ppm FROM c), " +
        "adj AS (SELECT arm, theta_e9, varred_ppm, y, " +
        "CAST(y AS HUGEINT) * 1000000000 - CAST(theta_e9 AS HUGEINT) * " +
        "CAST(x AS HUGEINT) AS adj12 FROM u CROSS JOIN p), " +
        "g AS (SELECT arm, theta_e9, varred_ppm, CAST(count(*) AS BIGINT) AS n_users, " +
        "CAST(sum(y) AS BIGINT) AS sy, sum(adj12) AS sadj " +
        "FROM adj GROUP BY 1, 2, 3) " +
        "SELECT arm, n_users, " +
        s"CAST(${roundDivSql("sy", "n_users", 1000L)} AS BIGINT) AS mean_raw_e6, " +
        "CAST(round(CAST(sadj AS DOUBLE) / CAST(n_users AS DOUBLE) / 1000000.0, 0) " +
        "AS BIGINT) AS mean_adj_e6, theta_e9, varred_ppm FROM g ORDER BY arm"),
    "q_ols_closed" ->
      ("WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS x1, " +
        "CAST(round(l_discount * 100, 0) AS BIGINT) AS x2, " +
        "CAST(round(l_extendedprice, 0) AS BIGINT) AS y FROM lineitem), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2, " +
        "CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x1 * x1) AS BIGINT) AS s11, " +
        "CAST(sum(x1 * x2) AS BIGINT) AS s12, CAST(sum(x2 * x2) AS BIGINT) AS s22, " +
        "CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y, " +
        "CAST(sum(y * y) AS BIGINT) AS syy FROM cells), " +
        "c AS (SELECT n, s1, s2, sy, " +
        "CAST(n AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS a11, " +
        "CAST(n AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * CAST(s2 AS HUGEINT) AS a12, " +
        "CAST(n AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT) AS a22, " +
        "CAST(n AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * CAST(sy AS HUGEINT) AS b1, " +
        "CAST(n AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * CAST(sy AS HUGEINT) AS b2, " +
        "CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS cyy " +
        "FROM m), " +
        "b AS (SELECT *, CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE) AS det FROM c), " +
        "bb AS (SELECT *, (CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det AS beta1d, " +
        "(CAST(b2 AS DOUBLE) * CAST(a11 AS DOUBLE) " +
        "- CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det AS beta2d FROM b) " +
        "SELECT n, CAST(round(beta1d * 1000000, 0) AS BIGINT) AS beta_qty_e6, " +
        "CAST(round(beta2d * 1000000, 0) AS BIGINT) AS beta_disc_e6, " +
        "CAST(round((CAST(sy AS DOUBLE) - beta1d * CAST(s1 AS DOUBLE) " +
        "- beta2d * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE) * 1000, 0) AS BIGINT) " +
        "AS intercept_e3, " +
        "CAST(round((beta1d * CAST(b1 AS DOUBLE) + beta2d * CAST(b2 AS DOUBLE)) " +
        "/ CAST(cyy AS DOUBLE) * 1000000, 0) AS BIGINT) AS r2_ppm FROM bb"),
    "q_logistic_step" -> logisticOracleSql,
    "q_merkle_diff" ->
      ("WITH base AS (SELECT l_orderkey * 10 + l_linenumber AS rid, " +
        "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) " +
        "AS cents FROM lineitem GROUP BY 1), " +
        "old AS (SELECT rid, cents FROM base WHERE rid % 1013 != 0), " +
        "nw AS (SELECT rid, cents + CASE WHEN rid % 997 = 0 THEN 100 ELSE 0 END " +
        "AS cents FROM base WHERE rid % 1009 != 0), " +
        "so AS (SELECT CAST('0x' || substr(md5(CAST(rid AS VARCHAR)), 1, 2) " +
        "AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS old_n, " +
        "CAST(bit_xor(CAST('0x' || substr(md5(concat_ws('|', rid, cents)), 1, 15) " +
        "AS BIGINT)) AS BIGINT) AS old_ck FROM old GROUP BY 1), " +
        "sn AS (SELECT CAST('0x' || substr(md5(CAST(rid AS VARCHAR)), 1, 2) " +
        "AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS new_n, " +
        "CAST(bit_xor(CAST('0x' || substr(md5(concat_ws('|', rid, cents)), 1, 15) " +
        "AS BIGINT)) AS BIGINT) AS new_ck FROM nw GROUP BY 1), " +
        "dirty AS (SELECT coalesce(so.bucket, sn.bucket) AS bucket, " +
        "coalesce(old_n, 0) AS old_n, coalesce(new_n, 0) AS new_n " +
        "FROM so FULL OUTER JOIN sn ON so.bucket = sn.bucket " +
        "WHERE old_n IS DISTINCT FROM new_n OR old_ck IS DISTINCT FROM new_ck), " +
        "ko AS (SELECT CAST('0x' || substr(md5(CAST(rid AS VARCHAR)), 1, 2) " +
        "AS BIGINT) AS bucket, rid, cents AS old_c FROM old), " +
        "kn AS (SELECT CAST('0x' || substr(md5(CAST(rid AS VARCHAR)), 1, 2) " +
        "AS BIGINT) AS bucket, rid, cents AS new_c FROM nw), " +
        "kod AS (SELECT ko.* FROM ko SEMI JOIN dirty ON ko.bucket = dirty.bucket), " +
        "knd AS (SELECT kn.* FROM kn SEMI JOIN dirty ON kn.bucket = dirty.bucket), " +
        "diff AS (SELECT coalesce(kod.bucket, knd.bucket) AS bucket, " +
        "CAST(sum(CASE WHEN old_c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added, " +
        "CAST(sum(CASE WHEN new_c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
        "CAST(sum(CASE WHEN old_c IS NOT NULL AND new_c IS NOT NULL " +
        "AND old_c != new_c THEN 1 ELSE 0 END) AS BIGINT) AS n_changed " +
        "FROM kod FULL OUTER JOIN knd ON kod.bucket = knd.bucket " +
        "AND kod.rid = knd.rid GROUP BY 1) " +
        "SELECT dirty.bucket // 16 AS super, dirty.bucket, old_n, new_n, " +
        "coalesce(n_added, 0) AS n_added, coalesce(n_removed, 0) AS n_removed, " +
        "coalesce(n_changed, 0) AS n_changed " +
        "FROM dirty LEFT JOIN diff ON dirty.bucket = diff.bucket " +
        "ORDER BY dirty.bucket"),
    "q_sprt" ->
      ("WITH t AS (SELECT event_id, CASE WHEN event_type = 'purchase' " +
        "THEN CAST(200670695 AS BIGINT) ELSE CAST(-50010421 AS BIGINT) END " +
        "AS llr_e9 FROM events), " +
        "r AS (SELECT CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) " +
        "AS trial, CAST(sum(llr_e9) OVER (ORDER BY event_id " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_e9 FROM t), " +
        "x AS (SELECT struct_extract(min(struct_pack(trial := trial, " +
        "cum_e9 := cum_e9)), 'trial') AS c_trial, " +
        "struct_extract(min(struct_pack(trial := trial, cum_e9 := cum_e9)), " +
        "'cum_e9') AS c_cum FROM r " +
        "WHERE cum_e9 >= 2944438979 OR cum_e9 <= -2944438979), " +
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_trials, " +
        "CAST(sum(llr_e9) AS BIGINT) AS final_llr_e9 FROM t) " +
        "SELECT CASE WHEN c_trial IS NULL THEN 'continue' " +
        "WHEN c_cum >= 2944438979 THEN 'accept_h1' ELSE 'accept_h0' END " +
        "AS decision, CAST(coalesce(c_trial, n_trials) AS BIGINT) " +
        "AS n_at_decision, CAST(coalesce(c_cum, final_llr_e9) AS BIGINT) " +
        "AS llr_e9, n_trials FROM tot CROSS JOIN x"),
    "q_xcorr_leadlag" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
        "CAST(count(*) AS BIGINT) AS x, " +
        "CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT) // 1000) AS BIGINT) AS y " +
        "FROM orders GROUP BY 1), " +
        "lg AS (SELECT CAST(i AS BIGINT) AS lag FROM range(-7, 8) t(i)), " +
        "j AS (SELECT lag, a.x AS x, b.y AS y FROM daily a CROSS JOIN lg " +
        "JOIN daily b ON b.day = a.day + CAST(lag AS INT)), " +
        "g AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx, " +
        "sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy, " +
        "sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy FROM j GROUP BY 1), " +
        "c AS (SELECT lag, n_days, CAST(n_days AS HUGEINT) * sxy " +
        "- CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS num, " +
        "CAST(n_days AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS d1, " +
        "CAST(n_days AS HUGEINT) * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS d2 " +
        "FROM g) " +
        "SELECT lag, n_days, CASE WHEN d1 = 0 OR d2 = 0 THEN 0 ELSE " +
        "CAST(round(CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE) " +
        "* CAST(d2 AS DOUBLE)) * 1000000, 0) AS BIGINT) END AS r_e6 " +
        "FROM c ORDER BY lag"),
    "q_mcnemar" ->
      ("WITH u AS (SELECT user_id, max(CASE WHEN event_type = 'error' AND " +
        "ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS a, " +
        "max(CASE WHEN event_type = 'error' AND " +
        "ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS b " +
        "FROM events GROUP BY 1), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n_users, " +
        "CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ab, " +
        "CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ba " +
        "FROM u) " +
        "SELECT n_users, n_ab, n_ba, " +
        "CASE WHEN n_ab + n_ba = 0 THEN 0 ELSE " +
        s"CAST(${roundDivSql("((n_ab - n_ba) * (n_ab - n_ba))", "(n_ab + n_ba)", 1000000L)} " +
        "AS BIGINT) END AS mcnemar_e6, " +
        "CASE WHEN n_ab + n_ba = 0 THEN 0 ELSE " +
        s"CAST(${roundDivSql("(greatest(abs(n_ab - n_ba) - 1, 0) * greatest(abs(n_ab - n_ba) - 1, 0))",
          "(n_ab + n_ba)", 1000000L)} AS BIGINT) END AS mcnemar_cc_e6 FROM g"),
    "q_jackknife_sources" ->
      ("WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS chars FROM documents GROUP BY 1), " +
        "p AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn, " +
        "CAST(sum(chars) AS BIGINT) AS ss FROM s) " +
        "SELECT source, n_docs, " +
        s"CAST(${roundDivSql("ss", "nn", 1000L)} AS BIGINT) AS pooled_mean_e3, " +
        s"CAST(${roundDivSql("(ss - chars)", "(nn - n_docs)", 1000L)} AS BIGINT) " +
        "AS loo_mean_e3, " +
        s"CAST(${roundDivSql("(ss - chars)", "(nn - n_docs)", 1000L)} AS BIGINT) " +
        s"- CAST(${roundDivSql("ss", "nn", 1000L)} AS BIGINT) AS influence_e3 " +
        "FROM s CROSS JOIN p ORDER BY source"),
    "q_bradley_terry" -> btOracleSql,
    "q_simpson_reversal" -> {
      val dppm = (nxy: String, nx: String, nny: String, n: String) =>
        s"CASE WHEN $nx = 0 OR $n - $nx = 0 THEN CAST(0 AS BIGINT) ELSE " +
          s"CAST(${ppmDivSql(nxy, nx)} AS BIGINT) - " +
          s"CAST(${ppmDivSql(nny, s"($n - $nx)")} AS BIGINT) END"
      "WITH cells AS (SELECT p.p_brand AS brand, " +
        "CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS x, " +
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y " +
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey), " +
        "g AS (SELECT brand, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(x) AS BIGINT) AS nx, CAST(sum(x * y) AS BIGINT) AS nxy, " +
        "CAST(sum((1 - x) * y) AS BIGINT) AS nny FROM cells GROUP BY 1), " +
        "pl AS (SELECT CAST(sum(n) AS BIGINT) AS pn, CAST(sum(nx) AS BIGINT) AS pnx, " +
        "CAST(sum(nxy) AS BIGINT) AS pnxy, CAST(sum(nny) AS BIGINT) AS pnny FROM g) " +
        "SELECT brand, n, " + dppm("nxy", "nx", "nny", "n") + " AS d_ppm, " +
        dppm("pnxy", "pnx", "pnny", "pn") + " AS pooled_d_ppm, " +
        "CAST((" + dppm("nxy", "nx", "nny", "n") + ") * (" +
        dppm("pnxy", "pnx", "pnny", "pn") + ") < 0 AS BIGINT) AS reversed " +
        "FROM g CROSS JOIN pl ORDER BY brand"
    },
    "q_uncertainty_sample" -> uncertaintyOracleSql,
    "q_crossval_ols" ->
      ("WITH cells AS (SELECT (((l_orderkey * 10 + l_linenumber) % 2147483648) " +
        "* 2654435761) % 4294967296 % 5 AS fold, " +
        "CAST(l_quantity AS BIGINT) AS x1, " +
        "CAST(round(l_discount * 100, 0) AS BIGINT) AS x2, " +
        "CAST(round(l_extendedprice, 0) AS BIGINT) AS y FROM lineitem), " +
        "bf AS (SELECT fold, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2, " +
        "CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x1 * x1) AS BIGINT) AS s11, " +
        "CAST(sum(x1 * x2) AS BIGINT) AS s12, CAST(sum(x2 * x2) AS BIGINT) AS s22, " +
        "CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y, " +
        "CAST(sum(y * y) AS BIGINT) AS syy FROM cells GROUP BY 1), " +
        "pl AS (SELECT CAST(sum(n) AS BIGINT) AS pn, CAST(sum(s1) AS BIGINT) AS p1, " +
        "CAST(sum(s2) AS BIGINT) AS p2, CAST(sum(sy) AS BIGINT) AS py, " +
        "CAST(sum(s11) AS BIGINT) AS p11, CAST(sum(s12) AS BIGINT) AS p12, " +
        "CAST(sum(s22) AS BIGINT) AS p22, CAST(sum(s1y) AS BIGINT) AS p1y, " +
        "CAST(sum(s2y) AS BIGINT) AS p2y FROM bf), " +
        "tr AS (SELECT fold, n AS n_test, sy AS tsy, syy AS tsyy, " +
        "pn - n AS tn, p1 - s1 AS t1, p2 - s2 AS t2, py - sy AS ty, " +
        "p11 - s11 AS t11, p12 - s12 AS t12, p22 - s22 AS t22, " +
        "p1y - s1y AS t1y, p2y - s2y AS t2y FROM bf CROSS JOIN pl), " +
        "cmo AS (SELECT fold, n_test, tsy, tsyy, tn, t1, t2, ty, " +
        "CAST(tn AS HUGEINT) * t11 - CAST(t1 AS HUGEINT) * CAST(t1 AS HUGEINT) AS a11, " +
        "CAST(tn AS HUGEINT) * t12 - CAST(t1 AS HUGEINT) * CAST(t2 AS HUGEINT) AS a12, " +
        "CAST(tn AS HUGEINT) * t22 - CAST(t2 AS HUGEINT) * CAST(t2 AS HUGEINT) AS a22, " +
        "CAST(tn AS HUGEINT) * t1y - CAST(t1 AS HUGEINT) * CAST(ty AS HUGEINT) AS b1, " +
        "CAST(tn AS HUGEINT) * t2y - CAST(t2 AS HUGEINT) * CAST(ty AS HUGEINT) AS b2 " +
        "FROM tr), " +
        "md AS (SELECT *, CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE) AS det FROM cmo), " +
        "md2 AS (SELECT *, (CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE) " +
        "- CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det AS beta1d, " +
        "(CAST(b2 AS DOUBLE) * CAST(a11 AS DOUBLE) " +
        "- CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det AS beta2d FROM md), " +
        "md3 AS (SELECT *, (CAST(ty AS DOUBLE) - beta1d * CAST(t1 AS DOUBLE) " +
        "- beta2d * CAST(t2 AS DOUBLE)) / CAST(tn AS DOUBLE) AS b0d FROM md2), " +
        "sse AS (SELECT cells.fold, CAST(sum(CAST(round((CAST(y AS DOUBLE) - b0d " +
        "- beta1d * CAST(x1 AS DOUBLE) - beta2d * CAST(x2 AS DOUBLE)) " +
        "* (CAST(y AS DOUBLE) - b0d - beta1d * CAST(x1 AS DOUBLE) " +
        "- beta2d * CAST(x2 AS DOUBLE)), 0) AS BIGINT)) AS BIGINT) AS sse " +
        "FROM cells JOIN md3 ON cells.fold = md3.fold GROUP BY 1) " +
        "SELECT md3.fold, n_test, " +
        "CAST(round(beta1d * 1000000, 0) AS BIGINT) AS beta_qty_e6, " +
        "CAST(round(beta2d * 1000000, 0) AS BIGINT) AS beta_disc_e6, " +
        "CAST(round((1.0 - CAST(sse AS DOUBLE) * CAST(n_test AS DOUBLE) " +
        "/ (CAST(n_test AS DOUBLE) * CAST(tsyy AS DOUBLE) " +
        "- CAST(tsy AS DOUBLE) * CAST(tsy AS DOUBLE))) * 1000000, 0) AS BIGINT) " +
        "AS oof_r2_ppm FROM md3 JOIN sse ON md3.fold = sse.fold ORDER BY md3.fold"),
    "q_pagerank_iter" -> pagerankOracleSql,
    "q_silhouette" ->
      ("WITH cents AS (SELECT vec_id AS cluster_id, embedding::DOUBLE[] AS centroid " +
        "FROM embeddings ORDER BY vec_id LIMIT 8), " +
        "dd AS (SELECT e.vec_id, c.cluster_id, " +
        "CAST(sum(CAST(round((u.val - c.centroid[u.pos]) * (u.val - c.centroid[u.pos]) " +
        "* 1000000000, 0) AS BIGINT)) AS BIGINT) AS d2e9 " +
        "FROM embeddings e CROSS JOIN cents c, " +
        "LATERAL (SELECT unnest(e.embedding::DOUBLE[]) AS val, " +
        "generate_subscripts(e.embedding, 1) AS pos) u GROUP BY 1, 2), " +
        "rk AS (SELECT vec_id, cluster_id, d2e9, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY d2e9, cluster_id) AS rn FROM dd), " +
        "sil AS (SELECT vec_id, max(CASE WHEN rn = 1 THEN cluster_id END) AS cluster_id, " +
        "max(CASE WHEN rn = 1 THEN d2e9 END) AS d1, " +
        "max(CASE WHEN rn = 2 THEN d2e9 END) AS d2 FROM rk GROUP BY 1), " +
        "sc AS (SELECT cluster_id, CASE WHEN d2 = 0 THEN CAST(0 AS BIGINT) ELSE " +
        "CAST(1000000 - (((d1 * 1000) // d2) * 1000 + (((d1 * 1000) % d2) * 1000) // d2) AS BIGINT) END AS s_ppm FROM sil) " +
        "SELECT cluster_id, CAST(count(*) AS BIGINT) AS n, " +
        "CAST((((CAST(sum(s_ppm) AS BIGINT)) // (CAST(count(*) AS BIGINT))) * 1 + (2 * ((CAST(sum(s_ppm) AS BIGINT)) % (CAST(count(*) AS BIGINT))) * 1 + (CAST(count(*) AS BIGINT))) // (2 * (CAST(count(*) AS BIGINT)))) AS BIGINT) " +
        "AS mean_s_ppm FROM sc GROUP BY 1 ORDER BY cluster_id"),
    "q_kendall_tau" ->
      ("WITH top AS (SELECT l_partkey AS p, " +
        "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty FROM lineitem " +
        "GROUP BY 1 ORDER BY rev DESC, p LIMIT 20), " +
        "pr AS (SELECT CAST(sign(a.rev - b.rev) AS BIGINT) AS sx, " +
        "CAST(sign(a.qty - b.qty) AS BIGINT) AS sy " +
        "FROM top a JOIN top b ON a.p < b.p), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc, " +
        "CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd, " +
        "CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx, " +
        "CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty FROM pr) " +
        "SELECT n_pairs, nc, nd, CASE WHEN n_pairs = tx OR n_pairs = ty THEN 0 " +
        "ELSE CAST(round(CAST(nc - nd AS DOUBLE) / sqrt(CAST(n_pairs - tx AS DOUBLE) " +
        "* CAST(n_pairs - ty AS DOUBLE)) * 1000000, 0) AS BIGINT) END AS tau_e6 " +
        "FROM g"),
    "q_wilson_ci" ->
      ("WITH g AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS k FROM events GROUP BY 1) " +
        "SELECT arm, n, k, " +
        "CAST(round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + 1.959963985 * 1.959963985 / (2.0 * CAST(n AS DOUBLE)) - 1.959963985 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + 1.959963985 * 1.959963985 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / (1.0 + 1.959963985 * 1.959963985 / CAST(n AS DOUBLE))) * 1000000, 0) AS BIGINT) AS lo_ppm, " +
        "CAST(round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + 1.959963985 * 1.959963985 / (2.0 * CAST(n AS DOUBLE)) + 1.959963985 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + 1.959963985 * 1.959963985 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / (1.0 + 1.959963985 * 1.959963985 / CAST(n AS DOUBLE))) * 1000000, 0) AS BIGINT) AS hi_ppm " +
        "FROM g ORDER BY arm"),
    "q_cohens_kappa" ->
      ("WITH c AS (SELECT CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END AS a, " +
        "CASE WHEN label < 5 THEN 1 ELSE 0 END AS b FROM embeddings), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(a) AS BIGINT) AS a1, " +
        "CAST(sum(b) AS BIGINT) AS b1, " +
        "CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree FROM c) " +
        "SELECT n, a1, b1, agree, " +
        "CAST(round(CAST(CAST(n AS HUGEINT) * agree - (CAST(a1 AS HUGEINT) * b1 " +
        "+ CAST(n - a1 AS HUGEINT) * (n - b1)) AS DOUBLE) " +
        "/ CAST(CAST(n AS HUGEINT) * n - (CAST(a1 AS HUGEINT) * b1 " +
        "+ CAST(n - a1 AS HUGEINT) * (n - b1)) AS DOUBLE) * 1000000, 0) " +
        "AS BIGINT) AS kappa_e6 FROM g"),
    "q_propensity_strata" ->
      ("WITH oc AS (SELECT l_orderkey, CAST(max(CASE WHEN l_returnflag = 'R' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS y FROM lineitem GROUP BY 1), " +
        "cells AS (SELECT CAST(floor(c_acctbal) AS BIGINT) // 2000 AS stratum, " +
        "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END " +
        "AS t, y FROM orders o JOIN oc ON o.o_orderkey = oc.l_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey), " +
        "g AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(t) AS BIGINT) AS nt, CAST(sum(t * y) AS BIGINT) AS nty, " +
        "CAST(sum((1 - t) * y) AS BIGINT) AS ncy FROM cells GROUP BY 1), " +
        "g2 AS (SELECT stratum, n, nt, CASE WHEN nt = 0 OR n - nt = 0 THEN " +
        "CAST(0 AS BIGINT) ELSE CAST(((nty * 1000) // nt) * 1000 + (((nty * 1000) % nt) * 1000) // nt AS BIGINT) - " +
        "CAST(((ncy * 1000) // (n - nt)) * 1000 + (((ncy * 1000) % (n - nt)) * 1000) // (n - nt) AS BIGINT) END AS d_ppm FROM g), " +
        "pl AS (SELECT CAST(sum(n * d_ppm) // sum(n) AS BIGINT) AS ate_ppm FROM g2) " +
        "SELECT stratum, n, nt, d_ppm, ate_ppm FROM g2 CROSS JOIN pl " +
        "ORDER BY stratum"),
    "q_kn_smooth" ->
      ("""WITH norm AS (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents)""" +
        ", tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, " +
        "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm WHERE t <> '')" +
        ", bi AS (SELECT token AS w1, lead(token) OVER " +
        "(PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok)" +
        ", c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi " +
        "WHERE w2 IS NOT NULL GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, " +
        "CAST(count(*) AS BIGINT) AS n1fw FROM c12 GROUP BY 1), " +
        "ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM c12 GROUP BY 1), " +
        "tt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM c12) " +
        "SELECT c12.w1, c12.w2, c12.c12, c1.c1, " +
        "CAST(((((4 * c12 - 3) * tt + 3 * n1fw * ncont) * 1000) // (4 * c1 * tt)) * 1000 + (((((4 * c12 - 3) * tt + 3 * n1fw * ncont) * 1000) % (4 * c1 * tt)) * 1000) // (4 * c1 * tt) AS BIGINT) " +
        "AS p_kn_ppm FROM c12 JOIN c1 ON c1.w1 = c12.w1 " +
        "JOIN ct ON ct.w2 = c12.w2 CROSS JOIN tt " +
        "ORDER BY c12.c12 DESC, c12.w1, c12.w2 LIMIT 20"),
    "q_power_analysis" ->
      ("WITH cells AS (SELECT CAST(round(value * 1000, 0) AS BIGINT) AS v " +
        "FROM events), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv, " +
        "sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS svv FROM cells), " +
        "c AS (SELECT n, sv, CAST(n AS HUGEINT) * svv - CAST(sv AS HUGEINT) " +
        "* CAST(sv AS HUGEINT) AS cvv FROM m) " +
        "SELECT n, CAST(round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 0) AS BIGINT) " +
        "AS mean_e3, CAST(round(CAST(cvv AS DOUBLE) / (CAST(n AS DOUBLE) " +
        "* CAST(n AS DOUBLE)), 0) AS BIGINT) AS var_e6, " +
        "CAST(round(2.801585219 * 2.801585219 * 2.0 " +
        "* (CAST(cvv AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) " +
        "/ ((0.02 * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "* (0.02 * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))), 0) AS BIGINT) " +
        "AS n_per_arm FROM c"),
    "q_ess_weights" ->
      ("WITH b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sw, " +
        "sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sww " +
        "FROM documents GROUP BY 1), " +
        "u AS (SELECT source, n_docs, sw, sww FROM b UNION ALL " +
        "SELECT '__all__' AS source, CAST(sum(n_docs) AS BIGINT), " +
        "CAST(sum(sw) AS BIGINT), CAST(sum(sww) AS HUGEINT) FROM b) " +
        "SELECT source, n_docs, " +
        "CAST(round(CAST(CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) AS DOUBLE) " +
        "/ CAST(sww AS DOUBLE), 0) AS BIGINT) AS ess, " +
        "CAST(round(CAST(CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) AS DOUBLE) " +
        "/ CAST(sww AS DOUBLE) / CAST(n_docs AS DOUBLE) * 1000000, 0) AS BIGINT) " +
        "AS efficiency_ppm FROM u ORDER BY source"),
    "q_rule_confidence" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem), " +
        "nn AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS nn FROM op), " +
        "item AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM op GROUP BY 1), " +
        "pair AS (SELECT a.p AS i, b.p AS j, CAST(count(*) AS BIGINT) AS n_ij " +
        "FROM op a JOIN op b ON a.k = b.k AND a.p < b.p GROUP BY 1, 2 " +
        "HAVING count(*) >= 5), " +
        "rules AS (SELECT i, j, n_ij FROM pair " +
        "UNION ALL SELECT j AS i, i AS j, n_ij FROM pair), " +
        "r2 AS (SELECT r.i, r.j, r.n_ij, ii.np AS n_i, jj.np AS n_j FROM rules r " +
        "JOIN item ii ON ii.p = r.i JOIN item jj ON jj.p = r.j), " +
        "r3 AS (SELECT i, j, n_ij, n_i, n_j, " +
        "CAST(((n_ij * 1000) // n_i) * 1000 + (((n_ij * 1000) % n_i) * 1000) // n_i AS BIGINT) AS conf_ppm, " +
        "CASE WHEN n_i = n_ij THEN CAST(999999999 AS BIGINT) ELSE " +
        "CAST((CAST(n_i AS HUGEINT) * (CAST(nn AS HUGEINT) - CAST(n_j AS HUGEINT)) " +
        "* 1000000) // (CAST(nn AS HUGEINT) * (CAST(n_i AS HUGEINT) " +
        "- CAST(n_ij AS HUGEINT))) AS BIGINT) END AS conviction_e6 " +
        "FROM r2 CROSS JOIN nn) " +
        "SELECT i, j, n_ij, n_i, n_j, conf_ppm, conviction_e6 FROM r3 " +
        "ORDER BY conf_ppm DESC, n_ij DESC, i, j LIMIT 20"),
    "q_fdr_bh" ->
      ("WITH cells AS (SELECT p.p_brand AS brand, l_orderkey AS k, " +
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y " +
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey), " +
        "ob AS (SELECT brand, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(k % 2) AS BIGINT) AS n1, " +
        "CAST(sum((k % 2) * y) AS BIGINT) AS s1, " +
        "CAST(sum((1 - (k % 2)) * y) AS BIGINT) AS s0 FROM cells GROUP BY 1), " +
        "obd AS (SELECT brand, CASE WHEN n1 = 0 OR n - n1 = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(((s1 * 1000) // n1) * 1000 + (((s1 * 1000) % n1) * 1000) // n1 AS BIGINT) - " +
        "CAST(((s0 * 1000) // (n - n1)) * 1000 + (((s0 * 1000) % (n - n1)) * 1000) // (n - n1) AS BIGINT) END " +
        "AS obs_d_ppm FROM ob), " +
        "nl AS (SELECT brand, CAST(r.i AS BIGINT) AS rep, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum((((k * 131 + CAST(r.i AS BIGINT) * 2654435761 + 17) " +
        "% 2147483648) * 2654435761) % 4294967296 % 2) AS BIGINT) AS n1, " +
        "CAST(sum(((((k * 131 + CAST(r.i AS BIGINT) * 2654435761 + 17) " +
        "% 2147483648) * 2654435761) % 4294967296 % 2) * y) AS BIGINT) AS s1, " +
        "CAST(sum((1 - ((((k * 131 + CAST(r.i AS BIGINT) * 2654435761 + 17) " +
        "% 2147483648) * 2654435761) % 4294967296 % 2)) * y) AS BIGINT) AS s0 " +
        "FROM cells CROSS JOIN range(64) r(i) GROUP BY 1, 2), " +
        "nld AS (SELECT brand, CASE WHEN n1 = 0 OR n - n1 = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(((s1 * 1000) // n1) * 1000 + (((s1 * 1000) % n1) * 1000) // n1 AS BIGINT) - " +
        "CAST(((s0 * 1000) // (n - n1)) * 1000 + (((s0 * 1000) % (n - n1)) * 1000) // (n - n1) AS BIGINT) END AS d_ppm " +
        "FROM nl), " +
        "e AS (SELECT nld.brand, CAST(min(obs_d_ppm) AS BIGINT) AS obs_d_ppm, " +
        "CAST(sum(CASE WHEN abs(d_ppm) >= abs(obs_d_ppm) THEN 1 ELSE 0 END) + 1 " +
        "AS BIGINT) AS e FROM nld JOIN obd ON obd.brand = nld.brand GROUP BY 1), " +
        "rk AS (SELECT *, CAST(row_number() OVER (ORDER BY e, brand) AS BIGINT) " +
        "AS rank FROM e), " +
        "km AS (SELECT CAST(coalesce(max(CASE WHEN e * 10 * " +
        "(SELECT count(*) FROM rk) <= rank * 65 " +
        "THEN rank END), 0) AS BIGINT) AS kmax FROM rk) " +
        "SELECT brand, obs_d_ppm, e, " +
        "CAST(((e * 1000) // 65) * 1000 + (((e * 1000) % 65) * 1000) // 65 AS BIGINT) AS p_ppm, rank, " +
        "CAST(rank <= kmax AS BIGINT) AS rejected FROM rk CROSS JOIN km " +
        "ORDER BY brand"),
    "q_mann_whitney" ->
      ("WITH vals AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v, " +
        "o_orderkey % 2 AS arm FROM orders), " +
        "census AS (SELECT v, CAST(count(*) AS BIGINT) AS t, " +
        "CAST(sum(arm) AS BIGINT) AS n1v FROM vals GROUP BY 1), " +
        "rk AS (SELECT v, t, n1v, CAST(coalesce(sum(t) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) " +
        "AS before FROM census), " +
        "g AS (SELECT CAST(sum(t - n1v) AS BIGINT) AS n0, " +
        "CAST(sum(n1v) AS BIGINT) AS n1, " +
        "CAST(sum(n1v * (2 * before + t + 1)) AS BIGINT) AS r1_x2, " +
        "sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) * CAST(t AS HUGEINT) " +
        "- CAST(t AS HUGEINT)) AS tie3 FROM rk), " +
        "h AS (SELECT n0, n1, r1_x2 - n1 * (n1 + 1) AS u1_x2, tie3, " +
        "CAST(n0 AS HUGEINT) + CAST(n1 AS HUGEINT) AS nn FROM g) " +
        "SELECT n0, n1, u1_x2, CASE WHEN n0 = 0 OR n1 = 0 THEN 0 ELSE " +
        "CAST(round((CAST(u1_x2 AS DOUBLE) / 2.0 - CAST(n0 AS DOUBLE) " +
        "* CAST(n1 AS DOUBLE) / 2.0) / sqrt(CAST(n0 AS DOUBLE) " +
        "* CAST(n1 AS DOUBLE) / 12.0 * ((CAST(nn AS DOUBLE) + 1.0) " +
        "- CAST(tie3 AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) " +
        "- 1.0)))) * 1000000, 0) AS BIGINT) END AS z_e6 FROM h"),
    "q_graph_modularity" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "dg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT pa AS n FROM e UNION ALL SELECT pb AS n FROM e) GROUP BY 1), " +
        "mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e), " +
        "ein AS (SELECT pa_b.p_brand AS brand, CAST(count(*) AS BIGINT) AS e_in " +
        "FROM e JOIN part pa_b ON pa_b.p_partkey = e.pa " +
        "JOIN part pb_b ON pb_b.p_partkey = e.pb " +
        "WHERE pa_b.p_brand = pb_b.p_brand GROUP BY 1), " +
        "ac AS (SELECT p.p_brand AS brand, CAST(count(*) AS BIGINT) AS n_nodes, " +
        "CAST(sum(d) AS BIGINT) AS a_c FROM dg JOIN part p ON p.p_partkey = dg.n " +
        "GROUP BY 1) " +
        "SELECT ac.brand, n_nodes, a_c, CAST(coalesce(e_in, 0) AS BIGINT) AS e_in, " +
        "CAST((coalesce(e_in, 0) * 1000000) // m AS BIGINT) " +
        "- CAST((CAST(a_c AS HUGEINT) * CAST(a_c AS HUGEINT) * 1000000) " +
        "// (4 * CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS BIGINT) " +
        "AS q_contrib_ppm FROM ac LEFT JOIN ein ON ein.brand = ac.brand " +
        "CROSS JOIN mm ORDER BY ac.brand"),
    "q_assortativity" ->
      ("WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb " +
        "FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "sym AS (SELECT pa AS src, pb AS dst FROM e " +
        "UNION ALL SELECT pb AS src, pa AS dst FROM e), " +
        "dg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT pa AS n FROM e UNION ALL SELECT pb AS n FROM e) GROUP BY 1), " +
        "j AS (SELECT dx.d AS x, dy.d AS y FROM sym " +
        "JOIN dg dx ON dx.n = sym.src JOIN dg dy ON dy.n = sym.dst), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS m2, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx, " +
        "sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy, " +
        "sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy FROM j), " +
        "c AS (SELECT m2, CAST(m2 AS HUGEINT) * sxy - CAST(sx AS HUGEINT) " +
        "* CAST(sy AS HUGEINT) AS num, CAST(m2 AS HUGEINT) * sxx " +
        "- CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS d1, " +
        "CAST(m2 AS HUGEINT) * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) " +
        "AS d2 FROM g) " +
        "SELECT m2 AS m_directed_edges, CASE WHEN d1 = 0 OR d2 = 0 THEN 0 ELSE " +
        "CAST(round(CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE) " +
        "* CAST(d2 AS DOUBLE)) * 1000000, 0) AS BIGINT) END AS r_e6 FROM c"),
    "q_bom_rollup" ->
      ("WITH rev AS (SELECT l_partkey AS p, " +
        "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) " +
        "AS cents FROM lineitem GROUP BY 1), " +
        "lv AS (SELECT CAST(i AS BIGINT) AS k FROM range(5) t(i)), " +
        "x AS (SELECT p // CAST(pow(10, k) AS BIGINT) AS anc, k, cents " +
        "FROM rev CROSS JOIN lv), " +
        "g AS (SELECT anc, CAST(count(*) AS BIGINT) AS n_contrib, " +
        "CAST(sum(cents) AS BIGINT) AS subtree_cents, " +
        "CAST(max(k) AS BIGINT) AS max_depth FROM x WHERE anc > 0 GROUP BY 1) " +
        "SELECT anc, n_contrib, subtree_cents, max_depth FROM g " +
        "ORDER BY subtree_cents DESC, anc LIMIT 20"),
    "q_permutation_test" ->
      ("WITH u AS (SELECT user_id, CAST(sum(CAST(round(value * 1000, 0) " +
        "AS BIGINT)) AS BIGINT) AS m FROM events GROUP BY 1), " +
        "a AS (SELECT CAST(r.i AS BIGINT) AS rep, m, " +
        "(((user_id * 131 + CAST(r.i AS BIGINT) * 2654435761 + 17) % 2147483648) " +
        "* 2654435761) % 4294967296 % 2 AS g FROM u CROSS JOIN range(64) r(i)), " +
        "nl AS (SELECT rep, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(g) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN g = 1 THEN m ELSE 0 END) AS BIGINT) AS s1, " +
        "CAST(sum(CASE WHEN g = 0 THEN m ELSE 0 END) AS BIGINT) AS s0 " +
        "FROM a GROUP BY 1), " +
        "nd AS (SELECT rep, CASE WHEN n1 = 0 OR n - n1 = 0 THEN CAST(0 AS BIGINT) " +
        s"ELSE CAST(${roundDivSql("s1", "n1", 1000L)} AS BIGINT) - " +
        s"CAST(${roundDivSql("s0", "(n - n1)", 1000L)} AS BIGINT) END AS d_e6 " +
        "FROM nl), " +
        "ob AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(user_id % 2) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN user_id % 2 = 1 THEN m ELSE 0 END) AS BIGINT) AS s1, " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 THEN m ELSE 0 END) AS BIGINT) AS s0 " +
        "FROM u), " +
        s"ob2 AS (SELECT CAST(${roundDivSql("s1", "n1", 1000L)} AS BIGINT) - " +
        s"CAST(${roundDivSql("s0", "(n - n1)", 1000L)} AS BIGINT) AS obs_d_e6 FROM ob) " +
        "SELECT obs_d_e6, CAST(count(*) AS BIGINT) AS n_reps, " +
        "CAST(sum(CASE WHEN abs(d_e6) >= abs(obs_d_e6) THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_extreme, " +
        s"CAST(${ppmDivSql("(CAST(sum(CASE WHEN abs(d_e6) >= abs(obs_d_e6) THEN 1 ELSE 0 END) AS BIGINT) + 1)",
          "(CAST(count(*) AS BIGINT) + 1)")} AS BIGINT) AS p_ppm " +
        "FROM nd CROSS JOIN ob2 GROUP BY obs_d_e6"),
  )
}
