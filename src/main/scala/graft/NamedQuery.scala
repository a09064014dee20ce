package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark builder plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism contract: every query orders its output by a full unique
  * key and aligns column names AND types with the oracle (BIGINT for
  * integral aggregates, ROUND(..., n) on floating aggregates at a digit
  * count that clears the data's decimal grid) so the driver's
  * hash-compare is stable.
  */
final case class NamedQuery(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object NamedQuery {
  def queryMap(qs: Seq[NamedQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.build).toMap
  def oracleMap(qs: Seq[NamedQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
