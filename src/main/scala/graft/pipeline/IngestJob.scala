package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion (reference entry point 1, SURVEY §3.1): webhook
  * bodies land as JSON files in an inbox directory; the job filters on
  * the routing chat id and appends them to the raw zone partitioned by
  * ingestion date.
  *
  * Spark mapping of the reference hot path (ipynb:295–337):
  *   - API GW → Lambda-per-event  ⇒ file-arrival micro-batches (at
  *     cluster scale: a Kafka source — same code, different `format`)
  *   - `chat_id == TELEGRAM_CHAT_ID` guard (ipynb:323)  ⇒ an early
  *     `filter` that Catalyst pushes into the scan
  *   - per-message S3 PUT with `context_date=` key (ipynb:330)  ⇒
  *     `partitionBy("context_date")` JSON sink
  *   - webhook retries / duplicate delivery (SURVEY §3.4)  ⇒ exactly-
  *     once sink bookkeeping via the checkpoint; ETL-side dedup by
  *     (chat_id, message_id) closes the remaining gap
  *
  * `context_date` is **ingestion wall-clock** in the pipeline timezone
  * (UTC-3 in the reference, ipynb:310) — event time is deliberately not
  * consulted (SURVEY §2.8).
  */
object IngestJob {

  val PipelineTz = "America/Sao_Paulo" // reference's UTC-3 (ipynb:310)

  /** The ingestion transform, shared by streaming and batch backfill:
    * routing filter + ingestion-date stamp.
    */
  def route(updates: DataFrame, chatId: Long): DataFrame =
    updates
      .filter(col("message.chat.id") === lit(chatId))
      .withColumn("context_date",
        to_date(from_utc_timestamp(current_timestamp(), PipelineTz)))

  /** Start the streaming job: inbox JSON → raw zone JSON, daily
    * partitions. One output file per micro-batch per partition — the
    * raw zone stays append-only and replayable.
    */
  def start(
      spark: SparkSession,
      inboxDir: String,
      rawDir: String,
      checkpointDir: String,
      chatId: Long,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val updates = spark.readStream
      .schema(TelegramSchema.updateSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", TelegramSchema.CorruptCol)
      .json(inboxDir)
    route(updates, chatId).writeStream
      .format("json")
      .option("path", rawDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("context_date")
      .trigger(trigger)
      .start()
  }
}
