package graft.analytics

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming.EventStreams

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** Streaming operators under the correctness gate.
  *
  * Both queries REALLY run Structured Streaming (file source → memory
  * sink inside the builder) and are checked against a DuckDB batch
  * formulation of the same semantics:
  *   - q32: tumbling 1-hour windows ≡ `date_trunc('hour', ts)` group-by
  *   - q33: 30-min-gap sessionization via flatMapGroupsWithState with
  *     event-time timeouts ≡ the classic lag/cumsum window-function
  *     sessionization
  *
  * A far-future sentinel row (user_id = -1, filtered from the output)
  * pushes the watermark past every real event so open sessions time out
  * and emit — the batch-closure analog of stream retirement.
  */
object StreamingQueries {

  private val runId = new AtomicInteger(0)

  /** events schema as the streaming file source needs it: the stage
    * below rewrites the source through [[Tables.normalizeTs]], so `ts`
    * arrives as a proper TimestampType regardless of the raw encoding
    * (epoch-nanos long or TIMESTAMP_NTZ micros across data generations).
    */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The file source wants a directory: stage the events table under a
    * DETERMINISTIC per-(source, run) path and clear it first — repeated
    * Verify/Bench runs reuse the same roots instead of leaking a fresh
    * copy into /tmp per invocation, and a prior run's sentinel rows can
    * never contaminate the next. The stage is a normalized REWRITE (not
    * a file copy): `ts` lands as TimestampType whatever the source
    * encoding, so the streaming schema above is exact and sentinel
    * batches append with plain timestamps.
    */
  private def stageEventsDir(s: SparkSession, dir: String): java.nio.file.Path = {
    // STABLE per-source path (no run counter): repeated runs in one JVM
    // reuse the same directory instead of leaking a fresh events copy
    // per invocation — the clear-first below also scrubs a prior run's
    // extra files (q41's duplicate copy) so queries can't contaminate
    // each other. Streaming queries against a given source dir run
    // sequentially in Verify/Bench, so reuse is safe.
    val root = Paths.get(sys.props("java.io.tmpdir"), "graft_stage",
      s"events_${Integer.toHexString(dir.hashCode)}")
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
    Files.createDirectories(root)
    Tables.load(s, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("append").parquet(root.toString)
    root
  }

  private def streamEvents(s: SparkSession, srcDir: String): DataFrame =
    s.readStream.schema(eventsRawSchema).parquet(srcDir)

  /** The lag/cumsum window-function sessionization — the batch
    * formulation of [[EventStreams.sessionize]]'s semantics, shared by
    * q42 and the streaming≡batch suite.
    */
  def batchSessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("sec") - col("prev") > EventStreams.GapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(timestamp_seconds(min("sec")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        round(sum("value"), 2).as("sum_value"))
      .select("user_id", "session_id", "n_events", "session_start", "sum_value")
      .orderBy("user_id", "session_id")
  }

  /** Shared by q62 (streaming) and q63 (batch): all (click, purchase)
    * pairs of one user with the purchase at most an hour after the
    * click.
    */
  def batchAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 hour"))
      .select("user_id", "click_id", "purchase_id")
      .orderBy("click_id", "purchase_id")
  }

  private val attributionOracle =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |ORDER BY click_id, purchase_id""".stripMargin

  private val hourlyOracle =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  private val sessionOracle =
    """WITH e AS (SELECT user_id, event_id, ts, value,
      |        epoch_us(ts) // 1000000 AS sec FROM events),
      |o AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
      |             OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS UNBOUNDED PRECEDING) AS sess_id FROM o)
      |SELECT user_id, CAST(sess_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       strftime(make_timestamp(min(sec) * 1000000), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       ROUND(SUM(value), 2) AS sum_value
      |FROM s GROUP BY user_id, sess_id ORDER BY user_id, session_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(

    // Batch formulations of the two streaming semantics — same oracles,
    // no micro-batch machinery. These are what a throughput bench should
    // measure; q32/q33 prove the streaming path computes the same thing.
    NamedQuery(
      "q42_sessionization_batch",
      Some(sessionOracle),
      (s, dir) => batchSessionize(Tables.load(s, dir, "events"))),

    NamedQuery(
      "q43_hourly_batch",
      Some(hourlyOracle),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .orderBy("window_start", "event_type")),

    // Batch formulation of the stream-stream interval join (q62's
    // semantics without micro-batch machinery — the benched form).
    NamedQuery(
      "q63_attribution_batch",
      Some(attributionOracle),
      (s, dir) => batchAttribution(Tables.load(s, dir, "events"))),

    // REAL stream-stream join run: click and purchase streams derived
    // from the same file source, watermarked on both sides, inner
    // interval join (state bounded by watermark + interval; matches
    // emit in the completing micro-batch — no sentinel needed).
    NamedQuery(
      "q62_stream_join",
      Some(attributionOracle),
      (s, dir) => {
        val name = s"graft_stream_join_${runId.incrementAndGet()}"
        val q = EventStreams.attributionJoin(streamEvents(s, stageEventsDir(s, dir).toString))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name).orderBy("click_id", "purchase_id")
      }),

    // REAL stream-static enrichment run: the events stream joins the
    // customer dimension (broadcast snapshot) map-side per micro-batch
    // — stateless streaming, oracle-gated against the plain batch join.
    // (Excluded from the bench headline with the other streaming runs;
    // its batch shape is the q11-family broadcast join, already
    // benched.) The user_id = c_custkey mapping is the fixture's
    // stand-in for an event→dimension foreign key.
    NamedQuery(
      "q69_stream_enrich",
      Some("""SELECT e.event_id, e.user_id, c.c_name, c.c_nationkey
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |ORDER BY e.event_id""".stripMargin),
      (s, dir) => {
        val name = s"graft_stream_enrich_${runId.incrementAndGet()}"
        val cust = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey")
        val q = EventStreams.enrichWithDim(
            streamEvents(s, stageEventsDir(s, dir).toString), cust, "user_id", "c_custkey")
          .select("event_id", "user_id", "c_name", "c_nationkey")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name).orderBy("event_id")
      }),

    // Batch twin of q41's semantics: the corpus unioned with itself
    // (every row an exact duplicate, the at-least-once redelivery shape)
    // collapsed by the same (event_id, ts) key dropDuplicates uses in
    // the stream — one hash-exchange on the key with a partial-agg
    // map side; counts must equal the single-copy oracle.
    NamedQuery(
      "q60_dedup_batch",
      Some("""SELECT event_type, count(*) AS n FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.unionAll(e)
          .dropDuplicates("event_id", "ts")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      }),

    NamedQuery(
      "q32_stream_hourly",
      Some(hourlyOracle),
      (s, dir) => {
        val name = s"graft_stream_hourly_${runId.incrementAndGet()}"
        val q = EventStreams.hourlyRollup(streamEvents(s, stageEventsDir(s, dir).toString))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete") // emit open windows too = batch semantics
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name).orderBy("window_start", "event_type")
      }),

    // Streaming exact dedup: the source dir is staged with the events
    // file TWICE (every row an exact duplicate); watermarked
    // dropDuplicates collapses them, so counts match the single-copy
    // batch oracle.
    NamedQuery(
      "q41_stream_dedup",
      Some("""SELECT event_type, count(*) AS n FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val stage = stageEventsDir(s, dir)
        // second normalized copy = the redelivery: same rows, new files
        Tables.load(s, dir, "events")
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1)
          .write.mode("append").parquet(stage.toString)
        val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
        val q = EventStreams.dedupStream(streamEvents(s, stage.toString))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name).orderBy("event_type")
      }),

    NamedQuery(
      "q33_sessionization",
      Some(sessionOracle),
      (s, dir) => {
        // Stage the source into a temp dir so a sentinel batch can be
        // appended after the real data to advance the watermark.
        val stage = stageEventsDir(s, dir)
        val stream = streamEvents(s, stage.toString)
        val name = s"graft_sessionize_${runId.incrementAndGet()}"
        val q = EventStreams.sessionize(EventStreams.asSessionEvents(stream))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .start()
        try {
          q.processAllAvailable()
          // Sentinel: one event far past everything → watermark jumps →
          // every open session times out and emits on the next batch.
          val maxTs = Tables.load(s, dir, "events").agg(max("ts")).head().getTimestamp(0)
          import s.implicits._
          val farFuture = new java.sql.Timestamp(maxTs.getTime + 365L * 86400 * 1000)
          Seq((-1L, farFuture, -1L, "sentinel", 0.0, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
            .write.mode("append").parquet(stage.toString)
          q.processAllAvailable()
        } finally q.stop()
        val w = Window.partitionBy("user_id").orderBy("session_start")
        s.table(name)
          .filter(col("user_id") >= 0)
          .withColumn("session_id", row_number().over(w).cast("long"))
          .select("user_id", "session_id", "n_events", "session_start", "sum_value")
          .withColumn("sum_value", round(col("sum_value"), 2))
          .orderBy("user_id", "session_id")
      })
  )
}
