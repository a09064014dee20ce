package graft.analytics

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own query surface (SURVEY.md §2), re-expressed over the
  * driver's synthetic tables. Each query maps 1:1 to an operator row:
  *
  *   - q01 scan + top-k                     (O1/O3, ipynb:770)
  *   - q02 count-by-day + sort desc         (A1/O1, ipynb:817–825)
  *   - q03 count by 3-col composite key     (A2, ipynb:849–864)
  *   - q04 AVG(length(text)) truncated      (A3/F1/F5, ipynb:888–903)
  *   - q05 hour/ISO-dow/ISO-week extraction (A4/F2/F6–F8, ipynb:928–958)
  *   - q06 equality filter + projection     (P1, ipynb:323–325)
  *   - q07 JSON payload unwrap              (P2/P4, ipynb:582, cell 40)
  *   - q08 union-all of homogeneous batches (U1, ipynb:583–593)
  *   - q09 chained CTEs via spark.sql       (C1, ipynb:930–958)
  *
  * All filters/projections are declarative so Catalyst pushes them into
  * the parquet scan; aggregations are partial→final HashAggregate with
  * map-side combine — no custom physical work needed at 100 TB, only
  * correct partitioning of the shuffle keys.
  */
object CoreQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val all: Seq[NamedQuery] = Seq(

    NamedQuery(
      "q01_scan_topk",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber")
          .limit(10)),

    // Reference Q2 (ipynb:817–825): daily message count, newest day first.
    NamedQuery(
      "q02_daily_count",
      Some("""SELECT CAST(ts AS DATE) AS context_date, count(*) AS message_amount
             |FROM events GROUP BY 1 ORDER BY context_date DESC""".stripMargin),
      (s, dir) =>
        events(s, dir)
          .groupBy(to_date(col("ts")).as("context_date"))
          .agg(count(lit(1)).as("message_amount"))
          .orderBy(col("context_date").desc)),

    // Reference Q3 (ipynb:849–864): count by 3-column composite key.
    NamedQuery(
      "q03_user_daily_count",
      Some("""SELECT user_id, event_type, CAST(ts AS DATE) AS context_date,
             |       count(*) AS message_amount
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY context_date DESC, user_id, event_type""".stripMargin),
      (s, dir) =>
        events(s, dir)
          .groupBy(col("user_id"), col("event_type"), to_date(col("ts")).as("context_date"))
          .agg(count(lit(1)).as("message_amount"))
          .orderBy(col("context_date").desc, col("user_id"), col("event_type"))),

    // Reference Q4 (ipynb:888–903): CAST(AVG(length(text)) AS INT).
    // Presto/Trino CAST(double AS int) rounds to NEAREST (ties away from
    // zero), unlike Spark's truncating cast — spelled as FLOOR(x + 0.5)
    // on both sides (lengths are non-negative, so half-up ≡ half-away).
    NamedQuery(
      "q04_avg_text_len",
      Some("""SELECT lang, source,
             |       CAST(FLOOR(AVG(LENGTH(text)) + 0.5) AS BIGINT) AS avg_message_length
             |FROM documents GROUP BY 1, 2 ORDER BY lang, source""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy("lang", "source")
          .agg(floor(avg(length(col("text"))) + lit(0.5)).cast("long").as("avg_message_length"))
          .orderBy("lang", "source")),

    // Reference Q5 (ipynb:928–958): message count per (hour, weekday, week).
    // Presto EXTRACT(dow) is ISO Mon=1…Sun=7 (SURVEY §7.4 trap #1): Spark's
    // weekday() is Mon=0…Sun=6, so +1; DuckDB's isodow matches directly.
    NamedQuery(
      "q05_time_extract",
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS parsed_date_hour,
             |       CAST(isodow(ts) AS BIGINT) AS parsed_date_weekday,
             |       CAST(weekofyear(ts) AS BIGINT) AS parsed_date_weeknum,
             |       count(*) AS message_amount
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY parsed_date_weeknum, parsed_date_weekday, parsed_date_hour""".stripMargin),
      (s, dir) =>
        events(s, dir)
          .groupBy(
            hour(col("ts")).cast("long").as("parsed_date_hour"),
            (weekday(col("ts")) + lit(1)).cast("long").as("parsed_date_weekday"),
            weekofyear(col("ts")).cast("long").as("parsed_date_weeknum"))
          .agg(count(lit(1)).as("message_amount"))
          .orderBy("parsed_date_weeknum", "parsed_date_weekday", "parsed_date_hour")),

    // Ingestion routing predicate (ipynb:323–325): equality filter early,
    // before anything else touches the row — pushed to the parquet scan.
    NamedQuery(
      "q06_filter_events",
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'click' AND user_id < 25
             |ORDER BY event_id""".stripMargin),
      (s, dir) =>
        events(s, dir)
          .filter(col("event_type") === "click" && col("user_id") < 25)
          .select("event_id", "user_id", "value")
          .orderBy("event_id")),

    // Payload unwrap (ipynb:582) + projection-defined schema (cell 40):
    // the nested JSON envelope here is the `props` JSON string column.
    NamedQuery(
      "q07_json_unwrap",
      Some("""SELECT event_type,
             |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             |       count(*) AS n
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, dir) =>
        events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(sum("k").as("k_sum"), count(lit(1)).as("n"))
          .orderBy("event_type")),

    // Union-all of homogeneous row batches (ipynb:583–593). In Spark the
    // per-day union is implicit in one scan; the explicit analog is
    // unionByName, which stays a narrow (no-shuffle) operator.
    NamedQuery(
      "q08_union_all",
      Some("""WITH u AS (
             |  SELECT user_id, value FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, value FROM events WHERE event_type = 'view'
             |)
             |SELECT user_id, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
             |FROM u GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val e = events(s, dir)
        val clicks = e.filter(col("event_type") === "click").select("user_id", "value")
        val views = e.filter(col("event_type") === "view").select("user_id", "value")
        clicks.unionByName(views)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .orderBy("user_id")
      }),

    // Chained CTEs (ipynb:930–958) through the SQL front end, exactly the
    // shape of reference Q5: derive columns in one CTE, aggregate the
    // derivations in the next, then sort.
    {
      // one dialect-shared string = Spark query AND oracle (no drift)
      val q9 =
        """WITH parsed AS (
          |  SELECT *, CAST(hour(ts) AS BIGINT) AS h FROM events
          |), agg AS (
          |  SELECT h, event_type, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
          |  FROM parsed GROUP BY h, event_type
          |)
          |SELECT * FROM agg ORDER BY h, event_type""".stripMargin
      NamedQuery(
        "q09_cte_chain",
        Some(q9),
        (s, dir) => {
          Tables.registerViews(s, dir)
          s.sql(q9)
        })
    }
  )
}
