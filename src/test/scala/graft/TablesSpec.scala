package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events `ts` encoding contract: the driver has regenerated
  * testdata with different physical timestamp encodings across rounds
  * (TIMESTAMP(NANOS) through round 9, TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) = TIMESTAMP_NTZ from round 10), and every
  * consumer goes through [[Tables.normalizeTs]] — so that adapter must
  * map all three encodings to the same TimestampType wall clock.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val wallClock = "2024-03-05 17:30:45"
  private val epochSec = 1709659845L // the above in UTC

  test("normalizeTs: nanos-long, TIMESTAMP_NTZ, and TimestampType all land on the same UTC wall clock") {
    import spark.implicits._
    val fromNanos = Tables.normalizeTs(
      Seq(epochSec * 1000000000L).toDF("ts"))
    val fromNtz = Tables.normalizeTs(
      Seq(epochSec).toDF("sec")
        .select(timestamp_seconds(col("sec")).cast(TimestampNTZType).as("ts")))
    val fromTs = Tables.normalizeTs(
      Seq(epochSec).toDF("sec")
        .select(timestamp_seconds(col("sec")).as("ts")))
    for ((df, label) <- Seq(fromNanos -> "nanos", fromNtz -> "ntz", fromTs -> "ts")) {
      assert(df.schema("ts").dataType === TimestampType, s"$label dtype")
      assert(df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .head().getString(0) === wallClock, s"$label wall clock")
    }
  }

  test("events loads as TimestampType whatever the parquet generation encodes") {
    val ts = Tables.load(spark, TestSpark.Sf001, "events").schema("ts")
    assert(ts.dataType === TimestampType)
  }
}
