package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Daily D-1 batch ETL (reference entry point 2, SURVEY §3.2): read one
  * raw-zone partition, flatten, dedup, compact to columnar, append to
  * the enriched zone.
  *
  * The reference does this in one Lambda (cell 38): list objects →
  * per-file json.load → parse_data → arrow concat → one parquet upload.
  * Here the same dataflow is a declarative plan: the partition-pruned
  * JSON scan is the listing, the flatten is a projection, the union is
  * implicit in the scan, and compaction is a write-side file-count
  * choice.
  *
  * Scale notes: `targetFiles` defaults to 1 to match the reference's
  * one-file-per-day contract (ipynb:475), but is a parameter because a
  * 100 TB day must fan out (SURVEY §7.4 item 3). Dedup on
  * (chat_id, message_id) collapses webhook redelivery (at-least-once →
  * exactly-once content, SURVEY §3.4).
  */
object EtlJob {

  /** Pure transform: raw updates for one day → enriched rows. */
  def transform(
      raw: DataFrame,
      day: java.time.LocalDate,
      dedup: Boolean = true): DataFrame = {
    val flat = Flatten(raw, day)
    if (dedup) flat.dropDuplicates("chat_id", "message_id") else flat
  }

  /** Run the ETL for one ingestion date. Returns (rows written, rejects). */
  def run(
      spark: SparkSession,
      rawDir: String,
      enrichedDir: String,
      day: java.time.LocalDate,
      targetFiles: Int = 1): (Long, Long) = {
    // Partition-pruned read: only this day's directory is listed/scanned,
    // the Spark analog of the reference's S3 Prefix= (ipynb:572).
    val dayDir = s"$rawDir/context_date=$day"
    // cached: the rejects count and the enriched write otherwise each
    // pay a full scan + JSON parse of the day
    val raw = spark.read
      .schema(TelegramSchema.updateSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", TelegramSchema.CorruptCol)
      .json(dayDir)
      .cache()
    try {
    val enriched = transform(raw, day)
    val nRejects = Flatten.rejects(raw).count()
    val out = if (targetFiles == 1) enriched.coalesce(1)
              else enriched.repartition(targetFiles)
    // Row count rides the write itself as an observed metric — at scale
    // a re-read of the partition just to count what was written is a
    // second full scan of the day.
    val obs = org.apache.spark.sql.Observation(s"etl_$day")
    // Idempotent per-day write: dynamic partition overwrite replaces ONLY
    // this day's partition, so a retried/backfilled run never duplicates
    // rows (plain Append would double the day on every re-run).
    out.observe(obs, count(lit(1)).as("n_rows")).write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("context_date")
      .parquet(enrichedDir)
    val n = obs.get("n_rows").asInstanceOf[Long]
    (n, nRejects)
    } finally raw.unpersist()
  }

  /** Register the enriched zone as the `telegram` table (the Athena
    * external-table analog, ipynb:732–750): partition discovery gives
    * the `context_date` partition column, the vectorized parquet reader
    * gives the scans.
    */
  def registerTable(spark: SparkSession, enrichedDir: String, name: String = "telegram"): Unit =
    spark.read.schema(TelegramSchema.enrichedSchema).parquet(enrichedDir)
      .createOrReplaceTempView(name)
}
