package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming vs batch equivalence on sf0.001: the streaming operators
  * must compute exactly what their batch window-function formulations
  * compute (the DuckDB oracle checks the batch side at sf0.01; this
  * suite closes the streaming≡batch loop in-engine).
  */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming sessionization (flatMapGroupsWithState) ≡ batch lag/cumsum sessionization") {
    val streamed = graft.analytics.StreamingQueries.all
      .find(_.name == "q33_sessionization").get
      .build(spark, TestSpark.Sf001)
      .collect().map(_.toSeq).toSet

    val batch = graft.analytics.StreamingQueries
      .batchSessionize(Tables.load(spark, TestSpark.Sf001, "events"))
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
  }

  test("sessionize: in-watermark out-of-order event in a later micro-batch never rewinds last-seen") {
    import spark.implicits._
    // user 1, 30-min gap. Batch 1 delivers t=+1000s and t=+2000s; batch 2
    // delivers t=+1900s OUT OF ORDER (within the 1h watermark) and then
    // t=+3750s. Correct state keeps lastTs = 2000 → 3750-2000 = 1750 ≤ gap
    // → ONE session of 4 events. A lastTs rewind to 1900 would split at
    // 3750-1900 = 1850 > gap — exactly the bug this pins.
    val base = 1700000000L
    def row(id: Long, sec: Long) = (id, (base + sec) * 1000000000L, 1L, "click", 1.0, "{}")
    val stage = java.nio.file.Files.createTempDirectory("sess_ooo")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1) // one file per batch → deterministic micro-batch order
        .write.parquet(s"$stage/$name")

    writeBatch("b1", Seq(row(1, 1000), row(2, 2000)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$stage/*/")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStreams.sessionize(EventStreams.asSessionEvents(stream))
      .writeStream.format("memory").queryName("sess_ooo_t").outputMode("append").start()
    try {
      q.processAllAvailable()
      writeBatch("b2", Seq(row(3, 1900), row(4, 3750)))
      q.processAllAvailable()
      // sentinel a year ahead → watermark passes → open session emits
      writeBatch("b3", Seq((-1L, (base + 365L * 86400) * 1000000000L, -1L, "sentinel", 0.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("sess_ooo_t").filter(col("user_id") === 1L)
      .select("session_start", "n_events", "sum_value").collect()
    assert(sessions.length === 1, s"expected one merged session, got ${sessions.toSeq}")
    assert(sessions.head.getLong(1) === 4L)
    // and it agrees with the batch lag/cumsum formulation on the same rows
    val batch = graft.analytics.StreamingQueries.batchSessionize(
      Seq(row(1, 1000), row(2, 2000), row(3, 1900), row(4, 3750))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .collect()
    assert(batch.length === 1 && batch.head.getAs[Long]("n_events") === 4L)
  }

  test("sessionize: late event rewinds session start; backward gap splits — both match batch") {
    import spark.implicits._
    // Watermark after b1 = max(ts) − 1h = 5000 − 3600 = 1400, so both
    // late arrivals (1500, 3000) are IN-watermark and must be honored.
    // user 1: b1 t=2000, b2 t=1500 (late, within gap) → ONE session
    //   STARTING at t=1500 — the start must rewind.
    // user 2: b1 t=5000, b2 t=3000 (late, 2000s behind = beyond gap) →
    //   TWO one-event sessions — a running-aggregate state would merge
    //   them (negative gap never exceeds GapSeconds).
    val base = 1700000000L
    def row(id: Long, user: Long, sec: Long) =
      (id, (base + sec) * 1000000000L, user, "click", 1.0, "{}")
    val stage = java.nio.file.Files.createTempDirectory("sess_rewind")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.parquet(s"$stage/$name")
    writeBatch("b1", Seq(row(1, 1, 2000), row(2, 2, 5000)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/*/")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStreams.sessionize(EventStreams.asSessionEvents(stream))
      .writeStream.format("memory").queryName("sess_rewind_t").outputMode("append").start()
    try {
      q.processAllAvailable()
      writeBatch("b2", Seq(row(3, 1, 1500), row(4, 2, 3000)))
      q.processAllAvailable()
      writeBatch("b3", Seq((-1L, (base + 365L * 86400) * 1000000000L, -1L, "s", 0.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    def fmt(sec: Long) = java.time.Instant.ofEpochSecond(base + sec)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val got = spark.table("sess_rewind_t").filter(col("user_id") > 0)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, fmt(1500), 2L),          // start rewound to the late event
      (2L, fmt(3000), 1L), (2L, fmt(5000), 1L))) // backward gap split
    // and the batch formulation agrees on the union of rows
    val batch = graft.analytics.StreamingQueries.batchSessionize(
      Seq(row(1, 1, 2000), row(2, 2, 5000), row(3, 1, 1500), row(4, 2, 3000))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batch === got)
  }

  test("sessionize: a continuous session spanning many watermark advances compacts but stays whole") {
    import spark.implicits._
    // One user, events every 10 min for 4 hours over 4 micro-batches:
    // as the watermark (1h delay) sweeps past earlier events the head
    // session compacts to its aggregate, yet the final emitted session
    // must still cover ALL events with the true start.
    val base = 1700000000L
    def row(id: Long, sec: Long) = (id, (base + sec) * 1000000000L, 1L, "click", 1.0, "{}")
    val stage = java.nio.file.Files.createTempDirectory("sess_compact")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$stage/$name")
    val perBatch = 6 // 6 events x 10 min = 1 hour per batch
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/*/")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    writeBatch("b0", (0 until perBatch).map(i => row(i, i * 600L)))
    val q = EventStreams.sessionize(EventStreams.asSessionEvents(stream))
      .writeStream.format("memory").queryName("sess_compact_t").outputMode("append").start()
    try {
      q.processAllAvailable()
      (1 to 3).foreach { b =>
        writeBatch(s"b$b", (0 until perBatch).map { i =>
          val n = b * perBatch + i; row(n, n * 600L)
        })
        q.processAllAvailable()
      }
      writeBatch("b9", Seq((-1L, (base + 365L * 86400) * 1000000000L, -1L, "s", 0.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_compact_t").filter(col("user_id") === 1L)
      .select("session_start", "n_events", "sum_value").collect()
    assert(got.length === 1, s"expected one continuous session, got ${got.toSeq}")
    assert(got.head.getLong(1) === (4L * perBatch))
    assert(got.head.getDouble(2) === 4.0 * perBatch)
  }

  test("enrichWithDim resolves identically-named join keys without ambiguity") {
    import spark.implicits._
    val stream = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("event_id", "user_id")
    val dim = Seq((10L, "gold"), (20L, "silver")).toDF("user_id", "tier")
    val out = EventStreams.enrichWithDim(stream, dim, "user_id", "user_id")
      .select("event_id", "tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "gold"), (2L, "silver")))
  }

  test("streaming hourly rollup ≡ batch date_trunc group-by") {
    val streamed = graft.analytics.StreamingQueries.all
      .find(_.name == "q32_stream_hourly").get
      .build(spark, TestSpark.Sf001)
      .collect().map(_.toSeq).toSet
    val batch = Tables.load(spark, TestSpark.Sf001, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }
}
