package graft.streaming

import graft.ops.LexIndex
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted BM25 lexical index
  * ([[graft.ops.LexIndex]]) — the lexical twin of
  * [[VectorIndexStream]]: each micro-batch of new documents appends
  * its postings/doclen/stats under the index's persisted bucket
  * fanout, behind the SAME per-stream batch ledger
  * (`_graft_batches/<streamId>/<id>`), so foreachBatch's
  * at-least-once redelivery is a no-op instead of a double-count.
  * The index stays append-pure: stats are additive rows, postings
  * and doclen are new-id appends (the ivfAppendIndex contract), so a
  * stream-built index is row-identical to a batch build over the
  * same documents — LexIndexSpec pins stream ≡ batch probe scores
  * and redelivery idempotence.
  */
object LexIndexStream {

  /** Append one micro-batch if its (streamId, batchId) has no ledger
    * marker yet. Returns true when the batch was appended.
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      path: String,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      LexIndex.bm25AppendIndex(batch, idCol, textCol, path)
    }

  /** Apply one micro-batch of takedown ids
    * ([[graft.ops.LexIndex.bm25DeleteIds]]) behind the batch ledger —
    * the streaming half of the delete lifecycle. The delete is a
    * single tombstone append (idempotent under redelivery by itself —
    * duplicate ids are legal); the ledger still short-circuits a
    * redelivered batch to O(1) and keeps the tombstone dir free of
    * duplicate batch files. Ledger namespace is kept apart from append
    * streams' so a delete stream and an append stream over the same
    * index can share batch ids.
    */
  def deleteBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      path: String,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path,
      VectorIndexStream.deleteLedgerId(streamId)) {
      LexIndex.bm25DeleteIds(batch, idCol, path)
    }

  /** The delete-stream writer: micro-batches of (idCol) takedown
    * requests; attach a checkpoint + trigger and `.start()`.
    */
  def deleteSink(
      stream: DataFrame,
      idCol: String,
      path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      deleteBatch(batch, batchId, idCol, path,
        VectorIndexStream.runningQueryId(batch))
      ()
    }

  /** The stream writer: attach a checkpoint + trigger and `.start()`.
    * The index root must already exist (bm25WriteIndex, possibly over
    * an empty frame) so the bucket fanout is fixed for the stream's
    * life.
    */
  def indexSink(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, batchId, idCol, textCol, path,
        VectorIndexStream.runningQueryId(batch))
      ()
    }
}
