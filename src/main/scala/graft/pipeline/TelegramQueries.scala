package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's five Athena queries (cells 50/55/58/61/64) over the
  * `telegram` table, as DataFrame builders with Athena-compatible
  * semantics. Each takes the enriched DataFrame so tests can run them
  * on fixtures without a catalog.
  *
  * Shapes (SURVEY §3.3): Q1 scan→limit; Q2 count by partition col;
  * Q3 count by 3 cols; Q4 avg(length)+truncating cast; Q5 CTE +
  * datetime extraction with Presto dow/week semantics.
  */
object TelegramQueries {

  /** Q1 (ipynb:770): `SELECT * FROM telegram LIMIT 10`. */
  def q1(telegram: DataFrame): DataFrame =
    telegram.limit(10)

  /** Q2 (ipynb:817–825): daily message count, newest first. */
  def q2(telegram: DataFrame): DataFrame =
    telegram.groupBy("context_date")
      .agg(count(lit(1)).as("message_amount"))
      .orderBy(col("context_date").desc)

  /** Q3 (ipynb:849–864): messages per user per day, newest first. */
  def q3(telegram: DataFrame): DataFrame =
    telegram.groupBy("user_id", "user_first_name", "context_date")
      .agg(count(lit(1)).as("message_amount"))
      .orderBy(col("context_date").desc)

  /** Q4 (ipynb:888–903): CAST(AVG(length(text)) AS INT) per user per
    * day — Presto/Trino CAST(double→int) rounds to NEAREST, ties away
    * from zero (not a truncation); AVG skips NULL text. Lengths are
    * non-negative, so FLOOR(x + 0.5) is exactly Presto's rounding.
    */
  def q4(telegram: DataFrame): DataFrame =
    telegram.groupBy("user_id", "user_first_name", "context_date")
      .agg(floor(avg(length(col("text"))) + lit(0.5)).cast("int").as("average_message_length"))
      .orderBy(col("context_date").desc)

  /** Q5 (ipynb:928–958): message count per (hour, ISO dow, ISO week).
    *
    * The reference's CTE does
    * `CAST(date_format(from_unixtime(date), '%Y-%m-%d %H:%i:%s') AS timestamp)`
    * — a round-trip that truncates to seconds and is exactly
    * `timestamp_seconds(date)` here (F2/F3 analysis in SURVEY §2.5);
    * the `compat` members exist for arbitrary patterns.
    */
  def q5(telegram: DataFrame): DataFrame = {
    val parsed = telegram.withColumn("parsed_date",
      PrestoCompat.prestoFromUnixtime(col("date")))
    parsed
      .withColumn("parsed_date_hour", hour(col("parsed_date")))
      .withColumn("parsed_date_weekday", PrestoCompat.prestoDow(col("parsed_date")))
      .withColumn("parsed_date_weeknum", PrestoCompat.prestoWeek(col("parsed_date")))
      .groupBy("parsed_date_hour", "parsed_date_weekday", "parsed_date_weeknum")
      .agg(count(lit(1)).as("message_amount"))
      // hour completes the unique sort key (the reference sorts only
      // weeknum/weekday, ipynb:956 — same prefix, now deterministic)
      .orderBy("parsed_date_weeknum", "parsed_date_weekday", "parsed_date_hour")
  }

  /** The same five queries as SQL text against a registered `telegram`
    * view — the reference's actual interface (SURVEY §7.4 item 7 keeps
    * the SQL surface first-class).
    */
  def sql(spark: SparkSession, n: Int): DataFrame = n match {
    case 1 => spark.sql("SELECT * FROM telegram LIMIT 10")
    case 2 => spark.sql(
      """SELECT context_date, count(1) AS message_amount
        |FROM telegram GROUP BY context_date ORDER BY context_date DESC""".stripMargin)
    case 3 => spark.sql(
      """SELECT user_id, user_first_name, context_date, count(1) AS message_amount
        |FROM telegram GROUP BY user_id, user_first_name, context_date
        |ORDER BY context_date DESC""".stripMargin)
    case 4 => spark.sql(
      """SELECT user_id, user_first_name, context_date,
        |       CAST(FLOOR(AVG(length(text)) + 0.5) AS INT) AS average_message_length
        |FROM telegram GROUP BY user_id, user_first_name, context_date
        |ORDER BY context_date DESC""".stripMargin)
    case 5 => spark.sql(
      """WITH parsed_date_cte AS (
        |  SELECT *, timestamp_seconds(date) AS parsed_date FROM telegram
        |), hour_week_cte AS (
        |  SELECT *,
        |         EXTRACT(hour FROM parsed_date) AS parsed_date_hour,
        |         weekday(parsed_date) + 1 AS parsed_date_weekday,
        |         EXTRACT(week FROM parsed_date) AS parsed_date_weeknum
        |  FROM parsed_date_cte
        |)
        |SELECT parsed_date_hour, parsed_date_weekday, parsed_date_weeknum,
        |       count(1) AS message_amount
        |FROM hour_week_cte
        |GROUP BY parsed_date_hour, parsed_date_weekday, parsed_date_weeknum
        |ORDER BY parsed_date_weeknum, parsed_date_weekday, parsed_date_hour""".stripMargin)
    case other => throw new IllegalArgumentException(s"no Q$other")
  }
}
