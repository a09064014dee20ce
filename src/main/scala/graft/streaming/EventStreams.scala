package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference's ingestion is stateless pass-through (SURVEY §2.8);
  * these are the stateful extensions a real event pipeline needs, built
  * the Spark-native way: event-time windows + watermarks for bounded
  * state, and `flatMapGroupsWithState` for custom session state. Each
  * has a batch-equivalent formulation (see StreamingQueries) so the
  * cross-engine oracle can check the semantics.
  */
object EventStreams {

  /** Tumbling-window count/sum per event type with a watermark bounding
    * state: at 100 TB/day the state store holds only the open windows
    * within the watermark horizon, keyed (window, event_type) — state
    * size is O(active windows), not O(events).
    */
  def hourlyRollup(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact deduplication: `dropDuplicates` keyed on the event
    * id with a watermark bounding the dedup state — the engine-native
    * answer to at-least-once upstream delivery (the reference's webhook
    * redelivery problem, SURVEY §3.4, in stream form). State holds only
    * keys younger than the watermark horizon.
    */
  def dedupStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id", "ts")

  // ------------------------------------------------------ sessionization

  final case class SessionEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: String,
      n_events: Long, sum_value: Double)

  implicit val sessionEventEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
  implicit val sessionStateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  val GapSeconds = 1800L // 30-minute inactivity gap

  private def fmt(epochSec: Long): String =
    java.time.Instant.ofEpochSecond(epochSec)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Per-user session windows with a 30-min inactivity gap, implemented
    * with `flatMapGroupsWithState` + event-time timeout: a session's
    * state is (start, lastSeen, count, sum); it closes — and emits —
    * when the watermark passes lastSeen + gap. State is O(active users),
    * shuffled once on user_id.
    */
  def sessionize(events: Dataset[SessionEvent], watermarkDelay: String = "1 hour"): Dataset[Session] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, fmt(s.start), s.n, s.sum))
          } else {
            // Events within a micro-batch are not ordered — sort this
            // group's slice; cross-batch ordering is the watermark's job.
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              st = st match {
                case null => SessionState(sec, sec, 1L, e.value)
                case s if sec - s.lastTs > GapSeconds =>
                  closed ::= Session(userId, fmt(s.start), s.n, s.sum)
                  SessionState(sec, sec, 1L, e.value)
                case s =>
                  // max(): an in-watermark out-of-order event from a later
                  // micro-batch must never rewind last-seen (and with it
                  // the timeout) — the batch lag/cumsum oracle keys the
                  // gap off the max timestamp seen, not the arrival order.
                  SessionState(s.start, math.max(s.lastTs, sec), s.n + 1, s.sum + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastTs * 1000 + GapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }

  /** Typed view of the raw events frame for [[sessionize]]. */
  def asSessionEvents(events: DataFrame): Dataset[SessionEvent] =
    events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[SessionEvent]

  /** Watermarked stream-stream interval join — click→purchase
    * attribution: every purchase pairs with each click by the same user
    * within the preceding `window`. Both sides carry event-time
    * watermarks AND the join condition bounds purchase_ts to
    * [click_ts, click_ts + window], so the state store provably retains
    * only rows inside watermark + interval — state is O(event rate ×
    * horizon), not O(stream length), at any volume. Inner join ⇒ a
    * match emits in the micro-batch that completes it (no closure
    * sentinel needed). Batch formulation: q63 (same oracle).
    */
  def attributionJoin(
      events: DataFrame,
      window: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("purchase_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("click_user") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $window"))
      .select(col("click_user").as("user_id"), col("click_id"), col("purchase_id"))
  }
}
