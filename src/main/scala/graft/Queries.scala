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
  *
  * The inventory body lives in six position-ordered tier traits
  * ([[QueriesCore]], [[QueriesPrep]], [[QueriesSketch]], [[QueriesRetrieval]],
  * [[QueriesStats]], [[QueriesEval]]) — each holds its defs plus its own
  * registry/oracle fragment; this object concatenates the fragments. */
object Queries extends QueriesCore with QueriesPrep with QueriesSketch with QueriesRetrieval with QueriesStats with QueriesEval {

  type Q = (SparkSession, String) => DataFrame

  /** [[graft.operators.Ops.presentSorted]] as a transform: final total
    * order for bounded-cardinality aggregate outputs without the range
    * sort's sampling pass. Only used where the row count is bounded by a
    * constant (enum/calendar group keys) — O(input) outputs keep orderBy. */
  private[graft] def ps(cols: Column*)(df: DataFrame): DataFrame =
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

  private[graft] def ppmDivSql(num: String, den: String): String =
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

  private[graft] def roundDivSql(num: String, den: String, pow: Long): String =
    s"(($num // $den) * $pow + (2 * ($num % $den) * $pow + $den) // (2 * $den))"

  private[graft] lazy val STOPWORDS = Seq("the", "and", "of", "to", "a", "is")
  private[graft] lazy val STOP_SQL = STOPWORDS.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Shared CTE prefix for normalized-text oracles. */
  private[graft] lazy val NORM_CTE =
    """WITH norm AS (SELECT doc_id, lang, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)"""

  /** Shared CTE chain for shingle/minhash oracles: 3-word shingles of the
    * normalized text, then 4 min-hash families as 8-hex-char slices of one
    * md5 per shingle (matching [[graft.operators.TextOps.minhashSignatureMd5]]). */
  private[graft] lazy val SIG_CTE = NORM_CTE +
    """, tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS token, generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm)""" +
    """, sh AS (SELECT doc_id, token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))""" +
    """, dig AS (SELECT doc_id, md5(shingle) AS h FROM sh WHERE shingle IS NOT NULL)""" +
    """, sig AS (SELECT doc_id, min(substr(h, 1, 8)) AS mh1, min(substr(h, 9, 8)) AS mh2, min(substr(h, 17, 8)) AS mh3, min(substr(h, 25, 8)) AS mh4 FROM dig GROUP BY doc_id)"""


  /** The [[qMmrRerank]] oracle: the 5 greedy MMR steps as chained
    * MATERIALIZED CTEs (materialization is load-bearing — DuckDB inlines
    * multiply-referenced CTEs, and the selected-set chain references each
    * step several times). */
  private[graft] def mmrOracleSql: String = {
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
  private[graft] lazy val TP_TOK_CTE =
    """WITH norm AS (SELECT doc_id, source, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)""" +
    ", tok AS (SELECT doc_id, source, unnest(string_split(t, ' ')) AS token, " +
    "generate_subscripts(string_split(t, ' '), 1) AS pos FROM norm WHERE t <> '')"

  /** Shared CTE chain for the evaluation-metric oracles: deterministic
    * integer score (elementwise-rounded Knuth-seed dot), global
    * (score, vec_id) ranking and the corpus total. */
  private[graft] lazy val SCORED_EMB_CTE =
    "WITH v AS (SELECT list_transform(generate_series(1, 64), j -> " +
      "CAST((j * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5) AS v), " +
      "e AS (SELECT vec_id, CAST(label AS BIGINT) AS label, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), " +
      "z AS (SELECT vec_id, label, unnest(emb) AS val, unnest(v) AS vv FROM e CROSS JOIN v), " +
      "sc AS (SELECT vec_id, label, CAST(sum(CAST(round(val * vv * 1000000, 0) AS BIGINT)) AS BIGINT) AS score " +
      "FROM z GROUP BY 1, 2), " +
      "r AS (SELECT vec_id, label, score, CAST(row_number() OVER (ORDER BY score, vec_id) AS BIGINT) AS rank FROM sc), " +
      "t AS (SELECT count(*) AS n_total FROM sc)"

  // ------------------------------------------------------------ registry

  // Tier-trait constructors run BEFORE this object body: everything the
  // per-tier registry/oracle vals touch at init time must be a def, a
  // lazy val, or a final-val constant (the CTE prefixes above are lazy
  // for exactly this reason). The require()s below turn an accidental
  // duplicate key across tier fragments into a loud init failure instead
  // of a silent left-biased Map merge.
  private val tierRegistries: Seq[Map[String, Q]] =
    Seq(registryCore, registryPrep, registrySketch, registryRetrieval, registryStats, registryEval)
  private val tierOracles: Seq[Map[String, String]] =
    Seq(oraclesCore, oraclesPrep, oraclesSketch, oraclesRetrieval, oraclesStats, oraclesEval)

  val all: Map[String, Q] = tierRegistries.reduce(_ ++ _)
  require(all.size == tierRegistries.map(_.size).sum,
    "duplicate query key across tier registries")

  val oracles: Map[String, String] = tierOracles.reduce(_ ++ _)
  require(oracles.size == tierOracles.map(_.size).sum,
    "duplicate oracle key across tier fragments")
  require(oracles.keySet.subsetOf(all.keySet),
    "oracle key with no registered query")
}
