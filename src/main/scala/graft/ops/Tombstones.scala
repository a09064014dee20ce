package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delete/tombstone lifecycle for the persisted-index family
  * ([[VectorOps.ivfWriteIndex]] exact IVF, [[Pq.pqIvfWriteIndex]]
  * IVF-PQ, [[LexIndex]] BM25, [[HammingIndex]] MIH) — the governance
  * gap a takedown / right-to-be-forgotten request hits first: every
  * layout supported build → append → stream → compact, but removing a
  * document id used to mean a full index rebuild.
  *
  * The mechanism is a tombstone relation per index root:
  *
  *   - `_graft_tombstones/` — a one-column parquet dir of deleted ids,
  *     underscore-hidden from every `spark.read.parquet(root)` data
  *     listing (the [[graft.streaming.VectorIndexStream]]
  *     `_graft_batches` ledger convention). Deletes APPEND here —
  *     never touch index data — so a delete is O(|ids|) regardless of
  *     index size and safe to run concurrently with probes.
  *   - Probe-side: every path-opening probe anti-joins the tombstone
  *     set out of the index slice it scanned, so deleted ids vanish
  *     from results IMMEDIATELY after the delete lands, before any
  *     physical rewrite. The anti-join is on the pruned slice (nProbe
  *     clusters / probed buckets), never the whole index, and skips
  *     entirely when no tombstones exist (one driver `exists` check).
  *   - Purge: the physical drop, run in a quiesced maintenance window
  *     like compaction. Only directories that actually CONTAIN
  *     tombstoned rows are rewritten (found by one column-pruned
  *     semi-join over the index's id column), through the same
  *     checked hide-rename publish protocol
  *     ([[Compaction.rewriteDirs]]); the tombstone set is cleared only
  *     after every affected directory published, so a crash anywhere
  *     leaves probes correct (anti-join still live) and the purge
  *     re-runnable (idempotent: already-purged dirs no longer match
  *     the semi-join).
  *
  * Duplicate tombstone rows are legal (re-deleting an id appends
  * again); every reader goes through [[ids]]' distinct. The sketch
  * tables ([[Sketches]]) are deliberately NOT in this family — see
  * the note there: HLL/CMS states are not subtractive, so their
  * delete path is rebuild-from-slices.
  */
object Tombstones {

  /** The tombstone dir under an index root — underscore-prefixed so
    * parquet data listings of the root never see it.
    */
  def dir(indexRoot: String): String = s"$indexRoot/_graft_tombstones"

  def exists(spark: SparkSession, indexRoot: String): Boolean = {
    val p = new Path(dir(indexRoot))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")) // local-FS .crc sidecars
  }

  /** Append `ids` (deduplicated within the batch; duplicates vs prior
    * deletes are allowed and harmless) to the index's tombstone set.
    */
  def add(ids: DataFrame, idCol: String, indexRoot: String): Unit =
    ids.select(col(idCol)).distinct()
      .write.mode("append").parquet(dir(indexRoot))

  /** The current tombstoned-id set as a one-column distinct frame, or
    * None when no delete has ever landed (the common case — probes
    * then skip the anti-join entirely).
    */
  def ids(spark: SparkSession, indexRoot: String, idCol: String)
      : Option[DataFrame] =
    if (!exists(spark, indexRoot)) None
    // glob the data files rather than opening the underscore-prefixed
    // dir itself: Spark reads the latter fine but logs an "All paths
    // were ignored" warning per open (the name trips its hidden-path
    // LOG filter); `exists` guarantees the glob is non-empty
    else Some(spark.read.parquet(s"${dir(indexRoot)}/part-*")
      .select(col(idCol)).distinct())

  /** Anti-join the tombstone set out of an index relation — identity
    * when no tombstones exist. `idCol` must be the index relation's id
    * column (also the name the tombstones were written under).
    */
  def excludeFrom(df: DataFrame, indexRoot: String, idCol: String)
      : DataFrame =
    ids(df.sparkSession, indexRoot, idCol) match {
      case Some(t) => df.join(t, Seq(idCol), "left_anti")
      case None => df
    }

  /** Drop the tombstone set (purge epilogue). Checked: a silent
    * failure here would be invisible until probes keep excluding
    * already-purged ids forever.
    */
  def clear(spark: SparkSession, indexRoot: String): Unit = {
    val p = new Path(dir(indexRoot))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && !fs.delete(p, true))
      throw new java.io.IOException(
        s"Tombstones.clear: could not delete $p")
  }

  /** The shared physical-drop pass: among `candidateDirs` (an index
    * layout's data directories), rewrite exactly those whose rows
    * contain a tombstoned id, dropping the matching rows, then clear
    * the tombstone set. `affected` maps the layout's relation to the
    * candidate dirs that need rewriting (a column-pruned semi-join on
    * the layout's partition columns — cheap: partition columns come
    * from directory names, so the scan reads only the id column).
    * Returns dirName → (filesBefore, filesAfter) for the dirs
    * rewritten.
    */
  private[ops] def purge(
      spark: SparkSession,
      indexRoot: String,
      idCol: String,
      candidateDirs: Seq[Path],
      affectedOf: (DataFrame, Seq[Path]) => Seq[Path],
      targetBytes: Long,
      opName: String,
      beforeRewrite: DataFrame => Unit = _ => (),
      beforeClear: () => Unit = () => ()): Map[String, (Int, Int)] =
    ids(spark, indexRoot, idCol) match {
      case None => Map.empty
      case Some(tombs0) =>
        // materialize the deduplicated tombstone set ONCE: every
        // affected directory's rewrite anti-joins against it, and
        // without the checkpoint each of those (now concurrent)
        // per-dir jobs would re-read the tombstone files and re-run
        // the distinct — takedown-sized work, but multiplied by up to
        // hundreds of dirs it dominated the round-17 purge probe
        val tombs = tombs0.localCheckpoint(true)
        try {
          // layout hooks around the rewrite, for layouts that must stage
          // derived state off the PRE-rewrite data (LexIndex stages the
          // negative stats row here) and publish it before the tombstone
          // clear — both run inside the same crash-idempotent protocol
          beforeRewrite(tombs)
          val affected = affectedOf(tombs, candidateDirs)
          val report = Compaction.rewriteDirs(spark, affected, targetBytes,
            opName,
            shouldRewrite = (_, _) => true,
            transform = df => df.join(tombs, Seq(idCol), "left_anti"))
          beforeClear()
          clear(spark, indexRoot)
          report
        } finally { tombs.unpersist(); () }
    }
}
