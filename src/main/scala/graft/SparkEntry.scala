package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2.3) re-expressed
  * on the harness tables; `oracleSql` carries the DuckDB-runnable ANSI
  * equivalent for every SQL-expressible entry (approx/float-unstable queries
  * are declared rows-only and self-checked in ScalaTest instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-nation: scan → filter → join×3 (broadcast dim) → agg → sort
    * in one Catalyst plan. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qJoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
