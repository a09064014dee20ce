package graft.streaming

import graft.ops.Pii
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming PII-incidence monitor ([[graft.ops.Pii]]): each
  * micro-batch of newly-ingested documents appends its own per-group
  * incidence ROWS ([[Pii.report]] — every column an additive count)
  * through the staged-rename exactly-once publish
  * ([[VectorIndexStream.ledgeredSingleFile]]), so neither at-least-once
  * redelivery nor a crash between write and marker can double-count. Readers re-sum via
  * [[Pii.readReport]]; stream-built ≡ batch-built count for count
  * (PiiSpec pins it). The compliance dashboard's live feed — how much
  * PII is arriving per source, without rescanning the corpus.
  */
object PiiStream {

  /** Append one micro-batch's incidence rows if its (streamId,
    * batchId) has no ledger marker yet. Returns true when appended.
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      groupCol: String,
      textCol: String,
      path: String,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgeredSingleFile(batch, batchId, path, streamId) {
      Pii.report(batch, groupCol, textCol)
    }

  /** The stream writer: attach a checkpoint + trigger and `.start()`. */
  def monitorSink(
      stream: DataFrame,
      groupCol: String,
      textCol: String,
      path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, batchId, groupCol, textCol, path,
        VectorIndexStream.runningQueryId(batch))
      ()
    }
}
