package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every correctness-gated query family. Each family lives in
  * its own module; `queries`/`oracleSql` are derived from the same
  * [[NamedQuery]] list so names can never drift between the two maps.
  */
object SparkEntry {

  private def families: Seq[NamedQuery] =
    analytics.CoreQueries.all ++
      analytics.JoinQueries.all ++
      analytics.DataOpsQueries.all ++
      analytics.StreamingQueries.all ++
      analytics.SubqueryQueries.all ++
      analytics.WideQueries.all ++
      analytics.FormatQueries.all ++
      analytics.UpsertQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reference Q2 shape (daily count, ipynb:817–825) over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_daily_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    NamedQuery.queryMap(families)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    NamedQuery.oracleMap(families)
}
