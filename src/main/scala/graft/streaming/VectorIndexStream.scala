package graft.streaming

import graft.ops.VectorOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of a persisted IVF ANN index
  * ([[VectorOps.ivfWriteIndex]] layout): each micro-batch of new
  * vectors is assigned to its nearest FROZEN centroid and appended into
  * the matching `cluster=` partitions via [[VectorOps.ivfAppendIndex]].
  * This closes the vector-store ingestion loop — embeddings arrive as a
  * stream, the index stays continuously probeable, and probe results
  * are identical to an index batch-built from the same rows under the
  * same centroids (frozen-centroid equivalence, pinned in
  * SimilaritySpec).
  *
  * 100 TB shape: per micro-batch work is one map-only centroid
  * assignment plus a partitioned append — the existing index is never
  * read. Centroids ride the plan as literals; there is no driver state
  * beyond them. Compaction cadence (the probe-vs-litter knee, SCALE.md
  * `ivf_litter`) is the only maintenance concern; `autoCompact` is
  * opt-in exactly as in [[VectorOps.ivfAppendIndex]] because the
  * publish protocol wants quiesced probes — a steady-state deployment
  * compacts in its maintenance window, not mid-stream.
  *
  * Exactly-once: foreachBatch is at-least-once (a batch id can be
  * redelivered after a restart) and a blind parquet append is not
  * idempotent, so [[appendBatch]] keeps a batch ledger under the index
  * root (`_graft_batches/<id>`, underscore-hidden from every parquet
  * listing): a redelivered id is skipped whole. The marker lands AFTER
  * the append, so a crash inside that narrow window can duplicate one
  * batch — the standard foreachBatch idempotence trade; ANN probes
  * tolerate it (a duplicated (id, vector) row ranks identically), and
  * a compaction rebuild heals it.
  */
object VectorIndexStream {

  /** Idempotent per-batch append — the foreachBatch body, exposed so
    * the redelivery contract is directly testable. Returns true when
    * the batch was appended, false when the ledger says it already was.
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      vecCol: String,
      path: String,
      centroids: Array[Array[Double]],
      autoCompact: Boolean = false,
      maxFilesPerCluster: Int = 8): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(path, s"_graft_batches/$batchId")
    val fs = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      VectorOps.ivfAppendIndex(batch, idCol, vecCol, path, centroids,
        autoCompact, maxFilesPerCluster)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      true
    }
  }

  /** The stream writer: attach a checkpoint + trigger and `.start()`.
    * Centroids are frozen for the life of the sink (the IVF maintenance
    * contract); re-fit and rebuild offline when recall decays.
    */
  def indexSink(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      centroids: Array[Array[Double]],
      autoCompact: Boolean = false,
      maxFilesPerCluster: Int = 8): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, batchId, idCol, vecCol, path, centroids,
        autoCompact, maxFilesPerCluster)
      ()
    }
}
