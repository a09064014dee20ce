package graft.streaming

import graft.ops.Pii
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming PII-incidence monitor ([[graft.ops.Pii]]): each
  * micro-batch of newly-ingested documents appends its own per-group
  * incidence ROWS ([[Pii.report]] — every column an additive count)
  * behind the shared per-stream batch ledger, so at-least-once
  * redelivery never double-counts. Readers re-sum via
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
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      Pii.report(batch, groupCol, textCol)
        .write.mode("append").parquet(path)
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
