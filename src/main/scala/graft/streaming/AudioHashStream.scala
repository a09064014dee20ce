package graft.streaming

import graft.ops.{AudioHash, HammingIndex}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming audio ingestion into the persisted perceptual-fingerprint
  * index — the audio twin of [[PhashStream]]: each micro-batch of
  * `(id, payload)` WAV rows is decoded to Haitsma–Kalker difference
  * vectors ([[graft.ops.AudioHash.audioFingerprint]] — a
  * partition-batched map, one decode per payload) and appended to the
  * MIH Hamming index under its persisted band geometry, behind the
  * shared per-stream batch ledger, so at-least-once redelivery never
  * duplicates band rows. Because the layout is append-pure, a
  * stream-built index probes identically to a batch build over the
  * same decodable clips (AudioHashSpec pins it); undecodable payloads
  * are DROPPED here — route them to a quarantine sink from
  * [[graft.ops.AudioHash.audioFingerprint]]'s typed reject relation
  * upstream if they must be accounted.
  *
  * Init the root once with `HammingIndex.hammingWriteIndex(empty, …,
  * dim = 64)` so the geometry is fixed for the stream's life; takedown
  * rides the existing layout-blind
  * [[VectorIndexStream.deleteBatch]]/`deleteSink`.
  */
object AudioHashStream {

  /** Decode + append one micro-batch if its (streamId, batchId) has no
    * ledger marker yet. Returns true when the batch was appended.
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      payloadCol: String,
      path: String,
      streamId: String = ""): Boolean =
    VectorIndexStream.ledgered(batch, batchId, path, streamId) {
      val (codes, _) = AudioHash.audioFingerprint(batch, idCol, payloadCol)
      HammingIndex.hammingAppendIndex(codes.toDF(), "id", "fp_diff", path)
    }

  /** The stream writer: attach a checkpoint + trigger and `.start()`. */
  def indexSink(
      stream: DataFrame,
      idCol: String,
      payloadCol: String,
      path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, batchId, idCol, payloadCol, path,
        VectorIndexStream.runningQueryId(batch))
      ()
    }
}
