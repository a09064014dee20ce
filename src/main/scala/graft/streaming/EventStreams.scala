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
  final case class BufEvt(sec: Long, event_id: Long, value: Double)
  final case class SessionBuf(evts: Seq[BufEvt])
  final case class Session(user_id: Long, session_start: String,
      n_events: Long, sum_value: Double)

  implicit val sessionEventEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
  implicit val sessionBufEnc: Encoder[SessionBuf] = Encoders.product[SessionBuf]
  implicit val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  val GapSeconds = 1800L // 30-minute inactivity gap

  private def fmt(epochSec: Long): String =
    java.time.Instant.ofEpochSecond(epochSec)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Per-user session windows with a 30-min inactivity gap, implemented
    * with `flatMapGroupsWithState` + event-time timeout.
    *
    * State is the BUFFER of this user's not-yet-final events inside the
    * watermark horizon, not a running (start, last, count) aggregate: an
    * in-watermark out-of-order event may rewind a session's start, merge
    * two provisional sessions, or split one — only re-sessionizing the
    * buffered slice reproduces the batch lag/cumsum semantics under
    * every arrival order (a running aggregate gets all three cases
    * wrong; Spark's own `session_window` buffers likewise). A session is
    * emitted exactly when `last event + gap < watermark`: any event
    * still to come has ts ≥ watermark, so nothing can extend, merge
    * into, or precede it. State is O(events within watermark + gap) per
    * user — the price of correctness under reordering; the watermark
    * bounds it.
    */
  def sessionize(events: Dataset[SessionEvent], watermarkDelay: String = "1 hour"): Dataset[Session] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionBuf]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val buf = (state.getOption.map(_.evts).getOrElse(Seq.empty) ++
              rows.map(e => BufEvt(e.ts.getTime / 1000, e.event_id, e.value)))
            .sortBy(e => (e.sec, e.event_id))
          // Re-sessionize the buffer: split where consecutive sorted
          // events are more than the gap apart (the batch formulation).
          val sessions = buf.foldLeft(List.empty[Vector[BufEvt]]) {
            case (acc, e) => acc match {
              case cur :: rest if e.sec - cur.last.sec <= GapSeconds =>
                (cur :+ e) :: rest
              case _ => Vector(e) :: acc
            }
          }.reverse
          val (closed, open) = sessions.partition(s => s.last.sec + GapSeconds < wmSec)
          val openEvts = open.flatten
          if (openEvts.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionBuf(openEvts))
            // fire strictly after the earliest open session can close;
            // must also be strictly beyond the current watermark
            state.setTimeoutTimestamp(math.max(
              (open.head.last.sec + GapSeconds) * 1000 + 1000,
              state.getCurrentWatermarkMs() + 1000))
          }
          closed.iterator.map(s =>
            Session(userId, fmt(s.head.sec), s.size.toLong, s.map(_.value).sum))
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
