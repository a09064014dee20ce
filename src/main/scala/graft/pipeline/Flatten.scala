package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The flatten projection (reference `parse_data`, cell 40
  * ipynb:623–648): whitelist + prefix-rename of the nested Update into
  * the enriched columns. Pure DataFrame → DataFrame, no I/O — the
  * single nontrivial transform of the pipeline, unit-tested in
  * isolation (SURVEY §7.1 build order).
  *
  * Differences from the reference, by design (SURVEY §3.4/§7.4):
  *   - non-`message` updates (e.g. `edited_message`) don't abort the
  *     batch (the reference's `data["message"]` KeyError, ipynb:582);
  *     they are routed to a reject relation instead
  *   - missing `text` is schema-level NULL (the reference's
  *     `[None]` default, ipynb:645–646)
  */
object Flatten {

  /** The projection itself: nested paths → flat enriched columns
    * (mapping table in SURVEY §1.3).
    */
  val enrichedColumns: Seq[Column] = Seq(
    col("message.message_id").as("message_id"),
    col("message.from.id").as("user_id"),
    col("message.from.is_bot").as("user_is_bot"),
    col("message.from.first_name").as("user_first_name"),
    col("message.chat.id").as("chat_id"),
    col("message.chat.type").as("chat_type"),
    col("message.text").as("text"),
    col("message.date").as("date"))

  /** Rows that can be flattened: a parseable record with a `message`
    * envelope carrying the required identity fields.
    */
  def isFlattenable(df: DataFrame): Column = {
    val hasCorrupt = df.columns.contains(TelegramSchema.CorruptCol)
    val notCorrupt =
      if (hasCorrupt) col(TelegramSchema.CorruptCol).isNull else lit(true)
    notCorrupt &&
      col("message").isNotNull &&
      col("message.message_id").isNotNull &&
      col("message.chat.id").isNotNull
  }

  /** Flatten the valid rows, stamping the given ingestion date. */
  def apply(updates: DataFrame, contextDate: java.time.LocalDate): DataFrame =
    updates
      .filter(isFlattenable(updates))
      .select(enrichedColumns :+
        lit(java.sql.Date.valueOf(contextDate)).as("context_date"): _*)

  /** The reject relation: whatever `apply` dropped, preserved verbatim
    * for reprocessing — the engine analog of not crashing the day on a
    * poison message.
    */
  def rejects(updates: DataFrame): DataFrame =
    updates.filter(!isFlattenable(updates))
}
