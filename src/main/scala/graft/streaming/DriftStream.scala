package graft.streaming

import graft.ops.Drift
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming PSI drift monitor ([[graft.ops.Drift]]): the reference
  * histogram is frozen once ([[Drift.psiWriteRef]]); each micro-batch
  * of newly-ingested rows appends its bucket counts additively behind
  * the SAME per-stream batch ledger the index sinks use, so
  * at-least-once redelivery never double-counts a batch. The live
  * report ([[Drift.psiFromStats]]) is identical to running the batch
  * [[Drift.psiReport]] over the raw snapshots — DriftSpec pins it.
  */
object DriftStream {

  /** Append one micro-batch's bucket counts if its (streamId, batchId)
    * has no ledger marker yet. Returns true when appended.
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      valueCol: String,
      path: String,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      Drift.psiAppendObserved(batch, valueCol, path)
    }

  /** The stream writer: attach a checkpoint + trigger and `.start()`.
    * The monitor root must already exist ([[Drift.psiWriteRef]]) so
    * the bucket geometry is fixed for the stream's life.
    */
  def monitorSink(
      stream: DataFrame,
      valueCol: String,
      path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, batchId, valueCol, path,
        VectorIndexStream.runningQueryId(batch))
      ()
    }
}
