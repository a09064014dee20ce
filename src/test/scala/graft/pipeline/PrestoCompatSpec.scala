package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Athena/Presto semantic traps of SURVEY §7.4 #1. The
  * property-style checks run over seeded random epochs (plain loops —
  * the scalatest/scalacheck bridge artifact isn't in the offline cache).
  */
class PrestoCompatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pattern translation: the reference's Q5 pattern (ipynb:935)") {
    assert(PrestoCompat.translateDateFormat("%Y-%m-%d %H:%i:%s") ===
      "yyyy'-'MM'-'dd' 'HH':'mm':'ss")
  }

  test("prestoDateFormat output matches Presto for the Q5 round-trip") {
    val df = Seq(1704628800L).toDF("epoch")
      .select(PrestoCompat.prestoDateFormat(
        PrestoCompat.prestoFromUnixtime(col("epoch")), "%Y-%m-%d %H:%i:%s").as("s"))
    assert(df.head().getString(0) === "2024-01-07 12:00:00")
  }

  test("unknown directive throws instead of corrupting output") {
    intercept[IllegalArgumentException] {
      PrestoCompat.translateDateFormat("%Q")
    }
  }

  test("%% escapes to a literal percent") {
    val df = Seq(1704628800L).toDF("epoch")
      .select(PrestoCompat.prestoDateFormat(
        PrestoCompat.prestoFromUnixtime(col("epoch")), "%H%%").as("s"))
    assert(df.head().getString(0) === "12%")
  }

  test("every supported date_format directive matches java.time field semantics over 200 seeded epochs") {
    // Ground truth constructed per-FIELD from ZonedDateTime — not via a
    // DateTimeFormatter pattern, which would test the translator
    // against itself.
    import java.time.{Instant, ZoneOffset}
    import java.time.format.TextStyle
    import java.util.Locale
    def expect(e: Long, directive: Char): String = {
      val z = Instant.ofEpochSecond(e).atZone(ZoneOffset.UTC)
      val h12 = { val h = z.getHour % 12; if (h == 0) 12 else h }
      directive match {
        case 'Y' => f"${z.getYear}%04d"
        case 'y' => f"${z.getYear % 100}%02d"
        case 'm' => f"${z.getMonthValue}%02d"
        case 'c' => z.getMonthValue.toString
        case 'd' => f"${z.getDayOfMonth}%02d"
        case 'e' => z.getDayOfMonth.toString
        case 'H' => f"${z.getHour}%02d"
        case 'k' => z.getHour.toString
        case 'h' | 'I' => f"$h12%02d"
        case 'l' => h12.toString
        case 'i' => f"${z.getMinute}%02d"
        case 's' | 'S' => f"${z.getSecond}%02d"
        case 'f' => "000000" // second-resolution input
        case 'p' => if (z.getHour < 12) "AM" else "PM"
        case 'W' => z.getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.US)
        case 'a' => z.getDayOfWeek.getDisplayName(TextStyle.SHORT, Locale.US)
        case 'M' => z.getMonth.getDisplayName(TextStyle.FULL, Locale.US)
        case 'b' => z.getMonth.getDisplayName(TextStyle.SHORT, Locale.US)
        case 'j' => f"${z.getDayOfYear}%03d"
        case 'T' => f"${z.getHour}%02d:${z.getMinute}%02d:${z.getSecond}%02d"
      }
    }
    val directives = "YymcdeHkhIliSspWaMbjT".toSeq :+ 'f'
    val rnd = new scala.util.Random(44)
    val epochs = Seq.fill(200)(math.abs(rnd.nextLong()) % 2051222400L)
    val cols = directives.map(d =>
      PrestoCompat.prestoDateFormat(timestamp_seconds(col("e")), s"%$d").as(s"d_$d"))
    val rows = epochs.toDF("e").select(col("e") +: cols: _*).collect()
    rows.foreach { r =>
      val e = r.getLong(0)
      directives.zipWithIndex.foreach { case (d, i) =>
        assert(r.getString(i + 1) === expect(e, d), s"epoch $e directive %$d")
      }
    }
  }

  test("prestoDow is ISO Mon=1..Sun=7 over 300 seeded random epochs") {
    val rnd = new scala.util.Random(42)
    val epochs = Seq.fill(300)(math.abs(rnd.nextLong()) % 2051222400L)
    val got = epochs.toDF("e")
      .select(col("e"), PrestoCompat.prestoDow(timestamp_seconds(col("e"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    epochs.foreach { e =>
      val expected = java.time.Instant.ofEpochSecond(e)
        .atZone(java.time.ZoneOffset.UTC).getDayOfWeek.getValue // ISO 1..7
      assert(got(e) === expected, s"epoch $e")
    }
  }

  test("prestoWeek is ISO week-of-year over 300 seeded random epochs") {
    val rnd = new scala.util.Random(43)
    val epochs = Seq.fill(300)(math.abs(rnd.nextLong()) % 2051222400L)
    val got = epochs.toDF("e")
      .select(col("e"), PrestoCompat.prestoWeek(timestamp_seconds(col("e"))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    epochs.foreach { e =>
      val expected = java.time.Instant.ofEpochSecond(e)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
        .get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear())
      assert(got(e) === expected, s"epoch $e")
    }
  }
}
