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
