package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Athena/Presto compatibility helpers (SURVEY §2.5, §7.4 trap #1).
  *
  * The reference's SQL runs on Athena (Presto dialect); three of its
  * scalar functions have different semantics in Spark, and the
  * correctness of Q5 hinges on them:
  *
  *   - `date_format` uses MySQL `%` patterns in Presto but Java
  *     patterns in Spark → translate the pattern string
  *   - `EXTRACT(dow)` is ISO Mon=1…Sun=7 in Presto; Spark's
  *     `dayofweek` is Sun=1…Sat=7 and `EXTRACT(DOW)` is Sun=0 →
  *     `weekday() + 1`
  *   - `from_unixtime` returns a timestamp in Presto but a formatted
  *     string in Spark → `timestamp_seconds` is the exact equivalent
  */
object PrestoCompat {

  /** MySQL-style `%` pattern → Java DateTimeFormatter pattern.
    * Covers the directives Presto's `date_format` documents; unknown
    * directives throw rather than silently corrupting timestamps.
    */
  def translateDateFormat(prestoPattern: String): String = {
    val sb = new StringBuilder
    var i = 0
    var literal = new StringBuilder
    def flushLiteral(): Unit = if (literal.nonEmpty) {
      sb.append("'").append(literal.toString.replace("'", "''")).append("'")
      literal = new StringBuilder
    }
    while (i < prestoPattern.length) {
      val c = prestoPattern.charAt(i)
      if (c == '%' && i + 1 < prestoPattern.length) {
        val d = prestoPattern.charAt(i + 1)
        val j = d match {
          case 'Y' => "yyyy"; case 'y' => "yy"
          case 'm' => "MM"; case 'c' => "M"
          case 'd' => "dd"; case 'e' => "d"
          case 'H' => "HH"; case 'k' => "H"
          case 'h' | 'I' => "hh"; case 'l' => "h"
          case 'i' => "mm"
          case 's' | 'S' => "ss"
          case 'f' => "SSSSSS"
          case 'p' => "a"
          case 'W' => "EEEE"; case 'a' => "EEE"
          case 'M' => "MMMM"; case 'b' => "MMM"
          case 'j' => "DDD"
          case 'T' => "HH:mm:ss"
          case '%' => literal.append('%'); ""
          case other =>
            throw new IllegalArgumentException(
              s"unsupported Presto date_format directive %$other")
        }
        if (j.nonEmpty) { flushLiteral(); sb.append(j) }
        i += 2
      } else {
        // Java patterns treat letters as directives — quote all literals.
        literal.append(c)
        i += 1
      }
    }
    flushLiteral()
    sb.toString
  }

  /** Presto `date_format(ts, '%...')` with exact output semantics. */
  def prestoDateFormat(ts: Column, prestoPattern: String): Column =
    date_format(ts, translateDateFormat(prestoPattern))

  /** Presto `EXTRACT(dow)` / `day_of_week`: ISO Mon=1…Sun=7. */
  def prestoDow(ts: Column): Column = weekday(ts) + lit(1)

  /** Presto `EXTRACT(week)`: ISO week of year — Spark's `weekofyear`
    * already matches.
    */
  def prestoWeek(ts: Column): Column = weekofyear(ts)

  /** Presto `from_unixtime(bigint)`: epoch seconds → timestamp. */
  def prestoFromUnixtime(epochSeconds: Column): Column =
    timestamp_seconds(epochSeconds)
}
