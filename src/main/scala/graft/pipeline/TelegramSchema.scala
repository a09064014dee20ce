package graft.pipeline

import org.apache.spark.sql.types._

/** Schema contracts for the Telegram pipeline (SURVEY.md §1).
  *
  * The raw zone is schema-on-read (reference stores webhook bodies
  * verbatim, ipynb:205); we pin an explicit nested StructType instead of
  * sampling-based inference so a malformed day can't silently flip
  * column types (the reference's pa.concat_tables failure mode,
  * SURVEY §3.4). PERMISSIVE mode + a corrupt-record column routes poison
  * messages instead of aborting the day.
  */
object TelegramSchema {

  /** Corrupt-record column name used across the pipeline. */
  val CorruptCol = "_corrupt_record"

  /** Nested Telegram `Update` payload (FIXTURES.md A1; reference fields
    * whitelisted at ipynb:623–648 + routing key at ipynb:323).
    */
  val updateSchema: StructType = StructType(Seq(
    StructField("update_id", LongType),
    StructField("message", StructType(Seq(
      StructField("message_id", LongType),
      StructField("from", StructType(Seq(
        StructField("id", LongType),
        StructField("is_bot", BooleanType),
        StructField("first_name", StringType)))),
      StructField("chat", StructType(Seq(
        StructField("id", LongType),
        StructField("type", StringType)))),
      StructField("date", LongType), // epoch seconds (ipynb:935)
      StructField("text", StringType)))), // nullable: absent key → null (ipynb:646)
    StructField(CorruptCol, StringType)))

  /** Enriched/presentation table (the Athena DDL, ipynb:732–742).
    * `context_date` is the partition column — ingestion date, not event
    * time (SURVEY §7.4 item 2).
    */
  val enrichedSchema: StructType = StructType(Seq(
    StructField("message_id", LongType),
    StructField("user_id", LongType),
    StructField("user_is_bot", BooleanType),
    StructField("user_first_name", StringType),
    StructField("chat_id", LongType),
    StructField("chat_type", StringType),
    StructField("text", StringType),
    StructField("date", LongType),
    StructField("context_date", DateType)))

  /** Typed views for unit tests / Dataset users. */
  final case class From(id: Long, is_bot: Boolean, first_name: String)
  final case class Chat(id: Long, `type`: String)
  final case class Message(
      message_id: Long, from: From, chat: Chat, date: Long,
      text: Option[String])
  final case class Update(update_id: Long, message: Option[Message])
  final case class ParsedMessage(
      message_id: Long, user_id: Long, user_is_bot: Boolean,
      user_first_name: String, chat_id: Long, chat_type: String,
      text: Option[String], date: Long, context_date: java.sql.Date)
}
