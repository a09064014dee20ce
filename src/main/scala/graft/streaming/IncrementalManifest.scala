package graft.streaming

import graft.ops.{Contamination, Dedup, Sampling}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incremental (streaming) variant of the q95 training-data manifest:
  * documents arrive as a stream, each micro-batch runs the same
  * composition the batch manifest pins — length-window quality filter →
  * exact dedup against everything already admitted
  * ([[Dedup.bloomDeltaDedup]], so the accumulated corpus participates
  * only as a 16-byte hash index) → decontaminate against the static
  * benchmark slice → flag bench members out of the training set — and
  * appends its admissions to a state directory. [[manifest]] then
  * assigns the deterministic (shard, pos) training order over the
  * admitted union with [[Sampling.seededShuffle]].
  *
  * Semantics vs the batch manifest (q95): dedup is FIRST-SEEN-WINS
  * across micro-batches (within a batch it is min-id, same as batch).
  * When batches arrive in id order — the spec's split, and the normal
  * "ids grow with time" production layout — first-seen coincides with
  * global min-id and the incremental manifest over the union is
  * row-identical to the batch one (pinned in PipelineEndToEndSpec).
  * Decontamination commutes with batching because containment is
  * row-local: a doc's verdict depends only on its own shingles and the
  * static bench, never on other corpus docs.
  *
  * Replay safety: each batch writes to `batch=<id>` with overwrite, and
  * the prior-index read EXCLUDES partitions >= the current batch id —
  * a failure-replayed batch therefore deduplicates against exactly the
  * state it saw the first time (its own half-written output can never
  * mask its input as "already seen") and overwrites its own partition
  * idempotently.
  *
  * 100 TB shape: per micro-batch work is O(|delta| + |index|) — the
  * bloom prefilter keeps the anti-join probe side to true duplicates
  * plus an fpp fraction, the admitted corpus never re-shuffles, and the
  * final (shard, pos) pass is the two-phase range-partition shape
  * ([[Sampling.seededShuffle]]), not a per-shard window funnel.
  */
object IncrementalManifest {

  private def stateSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("content_hash", StructType(Seq(
      StructField("h1", LongType), StructField("h2", LongType)))),
    StructField("in_train", BooleanType),
    StructField("batch", LongType)))

  /** Admitted state so far: one row per dedup winner, `in_train` marking
    * manifest membership. Empty-safe (schema-stable before any batch).
    */
  def readState(spark: SparkSession, stateDir: String, idCol: String = "doc_id"): DataFrame =
    try {
      val df = spark.read.parquet(stateDir)
      // partition-discovered `batch` arrives typed by inference; pin it
      df.select(col(idCol), col("content_hash"), col("in_train"),
        col("batch").cast("long").as("batch"))
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          java.util.Collections.emptyList[Row](), stateSchema(idCol))
    }

  /** One micro-batch's admissions: the batch-manifest composition over
    * `delta` with the accumulated `priorIndex` standing in for the
    * already-admitted corpus. Returns (idCol, content_hash, in_train).
    */
  def admitBatch(
      delta: DataFrame,
      bench: DataFrame,
      priorIndex: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minChars: Int = 150,
      maxChars: Int = 1500,
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val filtered = delta.filter(col("n_chars").between(minChars, maxChars))
    val winners = Dedup.bloomDeltaDedup(filtered, priorIndex, idCol, Seq(textCol))
    val clean = Contamination.decontaminate(
      winners, bench, idCol, textCol, shingleN, threshold)
    winners
      .join(clean.select(col(idCol), lit(true).as("_graft_clean")), Seq(idCol), "left")
      .join(bench.select(col(idCol), lit(true).as("_graft_bench")), Seq(idCol), "left")
      .select(col(idCol),
        Dedup.contentHash128(Seq(col(textCol))).as("content_hash"),
        (coalesce(col("_graft_clean"), lit(false)) &&
          !coalesce(col("_graft_bench"), lit(false))).as("in_train"))
  }

  /** Start the incremental admission stream: every micro-batch of
    * `docs` is admitted against the state accumulated in `stateDir`.
    * `bench` must be a STATIC relation (the benchmark slice).
    */
  def start(
      docs: DataFrame,
      bench: DataFrame,
      stateDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prior = readState(spark, stateDir, idCol)
          .filter(col("batch") < lit(batchId))
          .select(col("content_hash"))
        admitBatch(batch, bench, prior, idCol, textCol)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
        ()
      }
      .start()

  /** The training manifest over everything admitted so far — identical
    * schema and (shard, pos) assignment to the batch manifest (q95).
    */
  def manifest(
      spark: SparkSession,
      stateDir: String,
      idCol: String = "doc_id",
      nShards: Int = 8): DataFrame =
    Sampling.seededShuffle(
        readState(spark, stateDir, idCol).filter(col("in_train")).select(col(idCol)),
        idCol, nShards)
      .select(col(idCol), col("shard"), col("pos"))
}
