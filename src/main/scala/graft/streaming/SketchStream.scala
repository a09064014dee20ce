package graft.streaming

import graft.ops.Sketches
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of a persisted HLL sketch table
  * ([[graft.ops.Sketches]]): each micro-batch appends its own
  * per-group partial-sketch ROWS (the additive-rows contract LexIndex
  * uses for stats — never read-modify-write), behind the shared
  * per-stream batch ledger so at-least-once redelivery is a no-op.
  * Readers roll the partials up with `hll_union_agg`
  * ([[Sketches.readSketchTable]]); union is lossless at equal lgK, so
  * a stream-built table answers every rollup identically to a batch
  * build over the same rows — SketchesSpec pins stream ≡ batch and
  * redelivery idempotence. Rows per group grow by one per batch;
  * [[graft.ops.Compaction.compactDirs]] folds file litter without
  * touching row semantics.
  */
object SketchStream {

  /** Append one micro-batch's partial sketches if its
    * (streamId, batchId) has no ledger marker yet.
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      lgK: Int = 12,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      Sketches.hllAgg(batch, groupCols, valueCol, lgK)
        .write.mode("append").parquet(path)
    }

  /** The stream writer: attach a checkpoint + trigger and `.start()`. */
  def sketchSink(
      stream: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      lgK: Int = 12): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, batchId, groupCols, valueCol, path, lgK,
        VectorIndexStream.runningQueryId(batch))
      ()
    }

  /** CountMin twin: append one micro-batch's partial cell counts
    * ([[Sketches.cmAgg]] rows are additive — readers re-sum via
    * [[Sketches.cmMerge]], so stream-built ≡ batch-built EXACTLY,
    * cell for cell, not just within sketch error).
    */
  def cmAppendBatch(
      batch: DataFrame,
      batchId: Long,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      depth: Int = 4,
      width: Int = 2048,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      Sketches.cmAgg(batch, groupCols, valueCol, depth, width)
        .write.mode("append").parquet(path)
    }

  def cmSink(
      stream: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      depth: Int = 4,
      width: Int = 2048): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      cmAppendBatch(batch, batchId, groupCols, valueCol, path, depth, width,
        VectorIndexStream.runningQueryId(batch))
      ()
    }

  /** KLL quantile twin: append one micro-batch's per-group partial
    * sketches ([[Sketches.kllAgg]] rows — readers merge via
    * [[Sketches.readKllTable]]; the merged sketch honors the same
    * rank-error bound as a batch build, the KLL merge rule).
    */
  def kllAppendBatch(
      batch: DataFrame,
      batchId: Long,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      k: Int = 200,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      Sketches.kllAgg(batch, groupCols, valueCol, k)
        .write.mode("append").parquet(path)
    }

  def kllSink(
      stream: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      k: Int = 200): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      kllAppendBatch(batch, batchId, groupCols, valueCol, path, k,
        VectorIndexStream.runningQueryId(batch))
      ()
    }

  /** Theta set-algebra twin: append one micro-batch's per-group partial
    * sketches ([[Sketches.thetaAgg]] rows — readers union via
    * [[Sketches.readThetaTable]]; union at equal lgK is merge-order-
    * insensitive, so stream-built ≡ batch-built in every readout).
    */
  def thetaAppendBatch(
      batch: DataFrame,
      batchId: Long,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      lgK: Int = 12,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      Sketches.thetaAgg(batch, groupCols, valueCol, lgK)
        .write.mode("append").parquet(path)
    }

  def thetaSink(
      stream: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      path: String,
      lgK: Int = 12): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      thetaAppendBatch(batch, batchId, groupCols, valueCol, path, lgK,
        VectorIndexStream.runningQueryId(batch))
      ()
    }
}
