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
  final case class SessionAgg(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionBuf(head: Option[SessionAgg], evts: Seq[BufEvt])
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
    * A running (start, last, count) aggregate alone is WRONG under
    * reordering: an in-watermark out-of-order event may rewind a
    * session's start, merge two provisional sessions, or split one —
    * only events whose neighborhood is still reachable by future
    * arrivals must stay raw. The state is therefore hybrid:
    *   - `head`: the earliest open session, COMPACTED to an O(1)
    *     aggregate as its events fall at-or-below the watermark — their
    *     mutual structure is final (any future event has ts ≥ watermark
    *     and so sorts after them), and the only decision they still
    *     participate in, "does the next event continue this session?",
    *     needs just `head.last`. This keeps an always-active user
    *     (session that never closes) at O(1) state where a pure event
    *     buffer would grow without bound.
    *   - `evts`: raw events whose structure is NOT yet final — all
    *     within `gap` of the watermark or above it, so the buffer is
    *     bounded by the arrival horizon (watermark delay + gap).
    * A session is emitted exactly when `last + gap < watermark`: nothing
    * still to come can extend, merge into, or precede it. The
    * streaming ≡ batch equivalence incl. rewind/merge/split reorder
    * cases is suite-pinned and oracle-gated (q33/q42).
    *
    * NOTE: the state encoding changed shape (head aggregate + raw
    * buffer); a checkpoint written by an earlier version of this
    * operator does not restore — resume long-running deployments from a
    * new checkpoint location.
    */
  def sessionize(events: Dataset[SessionEvent], watermarkDelay: String = "1 hour"): Dataset[Session] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionBuf]) =>
          val wm = state.getCurrentWatermarkMs() / 1000
          val prev = state.getOption.getOrElse(SessionBuf(None, Nil))
          val raw = (prev.evts ++
              rows.map(e => BufEvt(e.ts.getTime / 1000, e.event_id, e.value)))
            .sortBy(e => (e.sec, e.event_id)).toVector
          var head: Option[SessionAgg] = prev.head
          val closed = scala.collection.mutable.ListBuffer.empty[SessionAgg]
          // Walk the raw prefix, folding finalized (≤ wm) events into the
          // head aggregate and closing head sessions at finalized splits.
          // Stop at the first event whose relationship to what follows
          // could still be changed by a future arrival — it stays raw.
          var i = 0
          var done = false
          while (i < raw.length && !done) {
            val e = raw(i)
            head match {
              case Some(h) if e.sec - h.last <= GapSeconds =>
                if (e.sec <= wm) {
                  head = Some(SessionAgg(h.start, e.sec, h.n + 1, h.sum + e.value))
                  i += 1
                } else done = true // above wm: later arrivals may interleave
              case Some(h) => // gap exceeded: split
                if (h.last + GapSeconds < wm) { closed += h; head = None }
                else done = true // head can still be extended by a future arrival
              case None =>
                if (e.sec <= wm) {
                  head = Some(SessionAgg(e.sec, e.sec, 1L, e.value)); i += 1
                } else done = true
            }
          }
          val keep = raw.drop(i)
          // If the whole buffer compacted, the head may itself be closed.
          // (With kept events this branch is unreachable: an extendable-
          // but-above-wm successor implies h.last > wm - gap, and a
          // closable split was taken in the loop.)
          head match {
            case Some(h) if keep.isEmpty && h.last + GapSeconds < wm =>
              closed += h; head = None
            case _ => ()
          }
          if (head.isEmpty && keep.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionBuf(head, keep))
            // fire strictly after the earliest open session can close
            // (kept-first-event sec is a conservative lower bound on its
            // session's last), and strictly beyond the current watermark
            val earliest = (head.map(_.last).toSeq ++ keep.headOption.map(_.sec)).min
            state.setTimeoutTimestamp(math.max(
              (earliest + GapSeconds) * 1000 + 1000,
              state.getCurrentWatermarkMs() + 1000))
          }
          closed.iterator.map(h => Session(userId, fmt(h.start), h.n, h.sum))
      }

  /** Typed view of the raw events frame for [[sessionize]]. */
  def asSessionEvents(events: DataFrame): Dataset[SessionEvent] =
    events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[SessionEvent]

  /** Stream-static enrichment join: each micro-batch joins the static
    * dimension snapshot map-side (broadcast) — stateless, no watermark
    * or state store involved, the streaming analog of the q11-family
    * broadcast dimension joins. At production scale the dimension is
    * re-resolved per micro-batch (a Delta/parquet path picks up dim
    * updates between batches); the stream side never shuffles.
    */
  def enrichWithDim(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame =
    // dataframe-qualified keys: bare col() is AMBIGUOUS_REFERENCE the
    // moment both sides carry the column name (streamKey == dimKey)
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey))

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
