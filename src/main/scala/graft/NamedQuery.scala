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
  /** Duplicate names must fail loudly: `toMap` keeps the LAST build but
    * `oracleMap` could keep a DIFFERENT family's oracle — a silent
    * run-B-against-A's-oracle mismatch.
    */
  private def requireDistinct(qs: Seq[NamedQuery]): Unit = {
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names across families: ${dups.mkString(", ")}")
  }
  def queryMap(qs: Seq[NamedQuery]): Map[String, (SparkSession, String) => DataFrame] = {
    requireDistinct(qs)
    qs.map(q => q.name -> q.build).toMap
  }
  def oracleMap(qs: Seq[NamedQuery]): Map[String, String] = {
    requireDistinct(qs)
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
  }
}

/** JSON string escape shared by Verify (oracle_sql.json) and Bench (the
  * headline line): backslash, quote, and ALL control chars — a tab or
  * CR in builder-authored SQL, or a quote in a path, would otherwise
  * break the driver's json parse.
  */
private[graft] object JsonStr {
  def apply(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
