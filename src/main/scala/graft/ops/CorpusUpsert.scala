package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coordinated document UPSERT across the persisted-index family
  * (exact IVF [[VectorOps.ivfWriteIndex]], IVF-PQ [[Pq]], BM25
  * [[LexIndex]], Hamming [[HammingIndex]]) — the daily-refresh loop
  * the reference pipeline embodies (D-1 re-partitions,
  * `ipynb:155`/`ipynb:562`), made crash-safe across ALL indexes at
  * once instead of hand-sequenced per index.
  *
  * The problem it closes: every layout supports append (NEW ids) and
  * delete (tombstone → probes exclude → purge), but a REVISED document
  * is neither — re-appending under the same id would double it, and
  * tombstoning the id would hide the new version along with the old
  * (tombstones are id-keyed). The fix is the composite-key discipline
  * the slot miners already use ([[VectorOps.SlotStride]]): every index
  * row is keyed by `rid = doc_id·2^16 + rev`. A revision is then a NEW
  * id (append contract holds verbatim), the superseded revision is a
  * DIFFERENT id (tombstone contract holds verbatim), and decode is
  * exact integer shift/mask for every doc_id < 2^47.
  *
  * One upsert batch (`key` = the caller's redelivery handle, e.g. the
  * D-1 partition date) runs:
  *
  *   1. STAGE the delta payload under `root/batches/<key>/delta` —
  *      retries re-use the frozen bytes, so a nondeterministic caller
  *      recomputation cannot fork the batch's content.
  *   2. ASSIGN revisions: new_rev = (max rev over all OTHER batches)
  *      + 1, or 0 for first-seen docs — recomputed identically on
  *      every retry because the batch's own `revs/batch=<key>` rows
  *      are excluded from the lookup; then record them (overwrite,
  *      idempotent).
  *   3. Per index, in order: build the delta's index rows into a
  *      staging dir that MIRRORS the index layout (`_graft_staged`
  *      marker once complete), then PUBLISH by renaming each staged
  *      file to a deterministic batch-keyed name inside the live
  *      index, tombstone the superseded rids, and drop the
  *      `applied-<index>` marker.
  *   4. Drop the batch `done` marker.
  *
  * Exactly-once under redelivery, by construction: the per-target
  * `applied` markers are AUTHORITATIVE (`done` is only the fast path
  * for a full redelivery — a batch re-applied with targets missing
  * their marker falls through and applies just those, which is also
  * how a later-added index backfills: re-run every batch in original
  * order against the extended target set; the backfill reproduces the
  * ORIGINAL rids because rev assignment is frozen — a re-apply reads
  * `revs/batch=<key>` back instead of recomputing, which would
  * otherwise see LATER batches' higher revs and diverge. Backfill
  * therefore requires the per-batch ledger: [[compactRevs]] folds it,
  * and a backfill into a folded batch is refused loudly — compact on
  * a cadence that keeps the backfill horizon you need, or rebuild a
  * late-added index from the corpus instead). A retry skips a done index
  * at its `applied` marker, re-stages only when `_graft_staged` is absent
  * (never after a publish began — publish requires the marker), and
  * re-publishing renames only the staged files still present (each
  * rename is a per-file atomic move to a name derived from the staged
  * file's own name, so a half-published stage completes without
  * duplicating the files already moved). Tombstone re-adds are legal
  * duplicates by the [[Tombstones]] contract. This is strictly
  * stronger than a mode("append") retry, whose multi-job commit can
  * leave a torn batch no marker protocol can repair (BM25's append is
  * THREE writes — postings, doclen, stats).
  *
  * Crash-recovery order (documented contract): re-run the SAME
  * `applyBatch` call until it returns. Serialization: one apply at a
  * time per root, no concurrent purge/compaction (the maintenance
  * window rule every index already has); purges run between batches
  * on the normal cadence and need no coordination — tombstoned old
  * revisions are invisible to probes the moment their index's
  * tombstone lands, purge only reclaims bytes.
  *
  * Visibility during an apply: an index publishes the new revision
  * BEFORE tombstoning the old one, so a concurrent probe sees (old),
  * then briefly (old AND new), then (new) — never neither. Callers
  * that need single-version reads mid-apply can post-filter with
  * [[currentRevs]].
  *
  * 100 TB shape: per batch, every pass is delta-sized (stage writes,
  * rev lookup join, tombstone appends) except nothing — the live
  * indexes are never read, let alone rewritten (the publish is file
  * METADATA, one rename per staged file); the rev ledger is
  * one (doc, rev) row per revision ever applied, compactable by
  * rewriting `revs/` to its max-rev rows. Probe cost inherits each
  * index's own pruned-slice story.
  */
object CorpusUpsert {

  /** Revision bits in the composite key: 65,536 revisions per doc,
    * doc_id < 2^47.
    */
  val RevBits = 16
  val MaxRev: Int = (1 << RevBits) - 1
  val MaxDoc: Long = 1L << (62 - RevBits + 1) // 2^47: rid stays positive

  /** The id column every target index is keyed by. */
  val RidCol = "rid"

  /** Composite rid — range-checked per row: an out-of-range doc or rev
    * would alias another document's key and corrupt every index
    * silently, so the job fails instead ([[VectorOps.SlotStride]]'s
    * checkedSlot discipline).
    */
  def ridExpr(doc: Column, rev: Column): Column =
    when(doc.cast("long").between(0L, MaxDoc - 1L) &&
        rev.cast("long").between(0L, MaxRev.toLong),
      shiftleft(doc.cast("long"), RevBits) + rev.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"CorpusUpsert: doc/rev out of [0,2^47)x[0,$MaxRev]: "),
        doc.cast("string"), lit("/"), rev.cast("string"))))

  /** Exact decode: integer shiftright (no Double-division cliff). */
  def docOf(rid: Column): Column = shiftright(rid, RevBits)

  def revOf(rid: Column): Column = rid.bitwiseAND(lit(MaxRev.toLong))

  /** One coordinated index. `stage` writes the delta's rows (keyed by
    * [[RidCol]]) under a staging root mirroring the index layout;
    * `delete` tombstones superseded rids through the layout's own
    * delete (idempotent under re-runs by the [[Tombstones]] dedup
    * contract).
    */
  sealed trait IndexTarget {
    def name: String
    def path: String
    private[ops] def stage(delta: DataFrame, stageDir: String): Unit
    private[ops] def delete(rids: DataFrame): Unit
    /** The layout's physical tombstone drop (quiesced window). */
    private[ops] def purge(spark: SparkSession): Map[String, (Int, Int)]
    /** The layout's append-litter fold (quiesced window, tombstone-free). */
    private[ops] def compact(spark: SparkSession): Map[String, (Int, Int)]
  }

  final case class IvfTarget(
      path: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      name: String = "ivf") extends IndexTarget {
    private[ops] def stage(delta: DataFrame, stageDir: String): Unit =
      VectorOps.ivfStageAppend(delta, RidCol, vecCol, path, stageDir,
        centroids)
    private[ops] def delete(rids: DataFrame): Unit =
      VectorOps.ivfDeleteIds(rids, RidCol, path)
    private[ops] def purge(spark: SparkSession): Map[String, (Int, Int)] =
      VectorOps.ivfPurgeIndex(spark, path, RidCol)
    private[ops] def compact(spark: SparkSession): Map[String, (Int, Int)] =
      VectorOps.ivfCompactIndex(spark, path)
  }

  final case class PqIvfTarget(
      path: String,
      vecCol: String,
      model: Pq.PqModel,
      centroids: Array[Array[Double]],
      name: String = "pqivf") extends IndexTarget {
    private[ops] def stage(delta: DataFrame, stageDir: String): Unit =
      Pq.pqIvfStageAppend(delta, RidCol, vecCol, path, stageDir, model,
        centroids)
    private[ops] def delete(rids: DataFrame): Unit =
      Pq.pqIvfDeleteIds(rids, RidCol, path)
    private[ops] def purge(spark: SparkSession): Map[String, (Int, Int)] =
      VectorOps.ivfPurgeIndex(spark, path, RidCol) // same cluster= layout
    private[ops] def compact(spark: SparkSession): Map[String, (Int, Int)] =
      VectorOps.ivfCompactIndex(spark, path)
  }

  final case class Bm25Target(
      path: String,
      textCol: String,
      name: String = "bm25") extends IndexTarget {
    private[ops] def stage(delta: DataFrame, stageDir: String): Unit =
      LexIndex.stageAppend(delta, RidCol, textCol, path, stageDir)
    private[ops] def delete(rids: DataFrame): Unit =
      LexIndex.bm25DeleteIds(rids, RidCol, path)
    private[ops] def purge(spark: SparkSession): Map[String, (Int, Int)] =
      LexIndex.bm25PurgeIndex(spark, path, RidCol)
    private[ops] def compact(spark: SparkSession): Map[String, (Int, Int)] =
      LexIndex.bm25CompactIndex(spark, path)
  }

  final case class HammingTarget(
      path: String,
      vecCol: String,
      name: String = "hamming") extends IndexTarget {
    private[ops] def stage(delta: DataFrame, stageDir: String): Unit =
      HammingIndex.stageAppend(delta, RidCol, vecCol, path, stageDir)
    private[ops] def delete(rids: DataFrame): Unit =
      HammingIndex.hammingDeleteIds(rids, RidCol, path)
    private[ops] def purge(spark: SparkSession): Map[String, (Int, Int)] =
      HammingIndex.hammingPurgeIndex(spark, path, RidCol)
    private[ops] def compact(spark: SparkSession): Map[String, (Int, Int)] =
      HammingIndex.hammingCompactIndex(spark, path)
  }

  /** The [[NearDupIndex]] MinHash-LSH layout as a coordinated target:
    * a revision's bucket+shingle rows stage under the persisted
    * geometry and the superseded rid tombstones out, so the ingest
    * dedup gate ([[NearDupIndex.dedupGate]]) always judges against the
    * corpus's CURRENT revisions.
    */
  final case class NearDupTarget(
      path: String,
      textCol: String,
      name: String = "neardup") extends IndexTarget {
    private[ops] def stage(delta: DataFrame, stageDir: String): Unit =
      NearDupIndex.stageAppend(delta, RidCol, textCol, path, stageDir)
    private[ops] def delete(rids: DataFrame): Unit =
      NearDupIndex.neardupDeleteIds(rids, RidCol, path)
    private[ops] def purge(spark: SparkSession): Map[String, (Int, Int)] =
      NearDupIndex.neardupPurgeIndex(spark, path, RidCol)
    private[ops] def compact(spark: SparkSession): Map[String, (Int, Int)] =
      NearDupIndex.neardupCompactIndex(spark, path)
  }

  final case class UpsertReport(
      key: String,
      alreadyApplied: Boolean,
      nDocs: Long,
      nUpdates: Long,
      nInserts: Long)

  /** Apply one upsert batch — see the object doc for the protocol.
    * `delta` carries `docCol` plus every payload column the targets
    * need (text and/or vector); exactly ONE row per doc (a batch with
    * two revisions of a document is ambiguous — refused). Zero-norm
    * vectors follow each vector layout's own drop contract (they
    * never enter the index; BM25 still indexes the doc's text).
    */
  /** `autoFoldRevsAt`: when the batch completes and the rev ledger
    * holds MORE than this many `revs/batch=` dirs, [[compactRevs]]
    * runs inline — without it, every later batch's rev lookup (and
    * every [[currentRevs]] call) reads one parquet dir per batch ever
    * applied, the same unbounded-litter curve the index appends had
    * before co-partitioning (GateSteadyProbe). The fold runs AFTER the
    * done marker inside the same serialized apply, so the quiesced-
    * window contract holds by construction; a crash mid-fold leaves
    * lookups exact in every interleaving (compactRevs' invariant) and
    * the next batch's trigger re-runs it. ≤ 0 disables. The fold
    * TRADES the backfill horizon (see the object doc): a later-added
    * target can only backfill batches whose per-batch revs survive,
    * so pick the threshold from how far back you add indexes.
    */
  def applyBatch(
      delta: DataFrame,
      docCol: String,
      key: String,
      root: String,
      targets: Seq[IndexTarget],
      autoFoldRevsAt: Int = 64): UpsertReport = {
    require(key.nonEmpty && key.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"applyBatch: key '$key' must be non-empty [A-Za-z0-9._-]")
    require(!key.startsWith(CompactedKey),
      s"applyBatch: key '$key' is reserved for [[compactRevs]]")
    require(targets.nonEmpty, "applyBatch: no index targets")
    require(targets.map(_.name).distinct.size == targets.size,
      "applyBatch: duplicate target names")
    val spark = delta.sparkSession
    val batchDir = new Path(s"$root/batches/$key")
    val fs = batchDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the per-target `applied` markers are AUTHORITATIVE; `done` is the
    // fast path for the common full redelivery. A batch re-applied with
    // targets that lack their marker (a crash between indexes, or an
    // index added to the coordination set later — backfill = re-run
    // every batch in original order against the extended set) falls
    // through and applies just the missing ones.
    val doneMarker = new Path(batchDir, "done")
    val wasDone = fs.exists(doneMarker)
    if (wasDone && targets.forall(t =>
        fs.exists(new Path(batchDir, s"applied-${t.name}"))))
      return UpsertReport(key, alreadyApplied = true, 0L, 0L, 0L)

    // 1. freeze the payload. A done batch whose delta is GONE was
    // vacuumed ([[vacuumBatches]]) — re-freezing from the caller's
    // redelivered frame would let a nondeterministic recomputation
    // fork the backfilled index's content from the originals, so the
    // backfill is refused (same horizon trade as the compacted
    // ledger). A crash-retry can never trip this: `done` is the last
    // write.
    val deltaDir = new Path(batchDir, "delta")
    val deltaFrozen = fs.exists(new Path(deltaDir, "_SUCCESS"))
    require(!(fs.exists(doneMarker) && !deltaFrozen),
      s"applyBatch: batch '$key' is done but its frozen delta is gone " +
        "(vacuumed) — backfilling a later-added target requires the " +
        "original payload; rebuild the new index from the corpus instead")
    // the freeze write and the prior-rev materialization below read
    // disjoint inputs (the caller's frame vs revs/batch= dirs) — start
    // the freeze in the pool so the rev lookup's jobs fill its tail
    // (guide §2.6; the await before `staged` keeps the read-frozen-
    // bytes contract intact)
    val freezeF =
      if (deltaFrozen) None
      else Some(inPool {
        delta.write.mode("overwrite").parquet(deltaDir.toString) })

    // 2. revision assignment. Once recorded, a batch's revs are
    // FROZEN — a re-apply REUSES `revs/batch=<key>` instead of
    // recomputing. The self-excluding recompute is only retry-stable
    // while no LATER batch has landed (applies are serialized, so
    // that covers every crash-retry); for a BACKFILL (re-running old
    // batches against a target added later) the recompute would see
    // the later batches' higher revs and assign a revision no other
    // index has — corrupting the ledger and the new index at once.
    // Reusing the recorded rows makes backfill exact through revision
    // chains: new_rev is read back, and old_rev is derivable from it
    // alone (new_rev = old + 1, or 0 first-seen ⇒ old = rev − 1 when
    // rev > 0, else none).
    // localCheckpoint ONCE: four index stagings then read materialized
    // rows instead of each re-running the lookup join (and the rid
    // range check fails the batch up front, before any index work).
    val revsDir = new Path(s"$root/revs/batch=$key")
    val revsFrozen = fs.exists(new Path(revsDir, "_SUCCESS"))
    // reaching here with the done marker set means a BACKFILL (some
    // target lacks its marker). Backfill needs this batch's frozen
    // revs; if compactRevs already folded them away, recomputing would
    // assign revisions the other indexes never saw — refuse loudly.
    // (A crash-retry can never trip this: `done` is the LAST write, so
    // an incomplete apply either has no done marker, or has frozen
    // revs — they land before any index work.)
    require(!(fs.exists(doneMarker) && !revsFrozen),
      s"applyBatch: batch '$key' is done but its revs/batch dir is gone " +
        "(compacted) — backfilling a later-added target requires the " +
        "per-batch rev ledger; re-apply batches newer than the last " +
        "compaction only, or rebuild the new index from the corpus")
    val prior0 =
      if (revsFrozen)
        spark.read.parquet(revsDir.toString)
          .select(col("doc").as(docCol),
            when(col("rev") > 0, col("rev") - 1).as("old_rev"),
            col("rev").as("frozen_rev"))
      else
        priorRevs(spark, fs, root, excludeKey = key)
          .withColumnRenamed("rev", "old_rev")
          .withColumnRenamed("doc", docCol)
    // ledger-sized; materialized NOW so its jobs overlap the in-flight
    // freeze write instead of serializing after it
    val prior = prior0.localCheckpoint(true)
    freezeF.foreach(await(_))
    val staged = spark.read.parquet(deltaDir.toString)
    val newRev =
      if (revsFrozen)
        coalesce(col("frozen_rev"), raise_error(concat(
          lit(s"applyBatch: batch '$key' has frozen revs but doc "),
          col(docCol).cast("string"),
          lit(" is not in them — the redelivered payload diverged"))))
      else
        when(col("old_rev").isNull, lit(0))
          .otherwise(when(col("old_rev") < MaxRev, col("old_rev") + 1)
            .otherwise(raise_error(concat(
              lit(s"applyBatch: rev overflow (> $MaxRev) for doc "),
              col(docCol).cast("string")))))
    val withRid = staged.join(prior, Seq(docCol), "left")
      .withColumn("new_rev", newRev)
      .withColumn(RidCol, ridExpr(col(docCol), col("new_rev")))
      .drop("frozen_rev")
      .localCheckpoint(true)
    prior.unpersist() // folded into withRid's checkpoint above
    val sizes = withRid.agg(count(lit(1)).as("n"),
      countDistinct(col(docCol)).as("nd"),
      count(col("old_rev")).as("nUpd")).head()
    require(sizes.getLong(0) == sizes.getLong(1),
      s"applyBatch: ${sizes.getLong(0) - sizes.getLong(1)} duplicate " +
        s"$docCol rows in batch '$key' — one revision per doc per batch")
    val nUpd = sizes.getLong(2)
    // record the batch's rev rows BEFORE any index work: currentRevs'
    // contract ("mid-apply this already reports the incoming
    // revision") requires it — a mid-apply reader post-filtering with
    // currentRevs while an index had already published the new rid and
    // tombstoned the old one would otherwise see NEITHER version. The
    // write is a tiny coalesce(1), so serializing it buys visibility
    // for almost no wall time.
    if (!revsFrozen)
      withRid.select(col(docCol).cast("long").as("doc"),
          col("new_rev").cast("int").as("rev"))
        .coalesce(1)
        .write.mode("overwrite").parquet(revsDir.toString)
    val oldRids = withRid.filter(col("old_rev").isNotNull)
      .select(ridExpr(col(docCol), col("old_rev")).as(RidCol))

    // 3. per-index stage → publish → tombstone → marker. The four
    // index layouts are INDEPENDENT (each has its own stage dir,
    // applied marker, and tombstone set), so their blocks run
    // concurrently — wall time is the slowest layout, not the sum (the
    // serial contract is across BATCHES, not across an one batch's
    // indexes).
    awaitAll(targets.map { t => inPool {
      val appliedM = new Path(batchDir, s"applied-${t.name}")
      val stageDir = new Path(batchDir, s"stage-${t.name}")
      if (!fs.exists(appliedM)) {
        val stagedM = new Path(stageDir, "_graft_staged")
        if (!fs.exists(stagedM)) {
          t.stage(withRid, stageDir.toString)
          touch(fs, stagedM)
        }
        publishStage(fs, stageDir, new Path(t.path), key)
        // an all-inserts batch (the bootstrap case) tombstones nothing;
        // skipping the write keeps the index tombstone-free, so probes
        // keep their fast no-tombstone path
        if (nUpd > 0) t.delete(oldRids)
        touch(fs, appliedM)
      }
      fs.delete(stageDir, true)
    }})
    touch(fs, doneMarker)
    // never fold on a BACKFILL re-apply (the batch was already done, so
    // nothing new landed in the ledger): the remaining backfill batches
    // NEED their per-batch revs, and the first re-applied batch would
    // otherwise compact them all away and wedge the rest
    if (autoFoldRevsAt > 0 && !wasDone) {
      val revsRoot = new Path(s"$root/revs")
      val nDirs =
        if (!fs.exists(revsRoot)) 0
        else fs.listStatus(revsRoot).count(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch="))
      if (nDirs > autoFoldRevsAt) compactRevs(spark, root)
    }
    UpsertReport(key, alreadyApplied = false, sizes.getLong(0), nUpd,
      sizes.getLong(0) - nUpd)
  }

  /** Reclaim the frozen delta payloads of fully-applied batches — the
    * storage maintenance pass `batches/` needs on a long-lived root:
    * every batch keeps its complete payload bytes forever (that freeze
    * IS the exactly-once redelivery story), which at corpus scale is a
    * second copy of all data ever ingested. Vacuuming a batch deletes
    * `delta/` and any leftover `stage-*` dirs but KEEPS the markers
    * and the frozen revs, so:
    *   - a full redelivery still short-circuits (markers),
    *   - rev lookups are untouched (`revs/` is not here),
    *   - a BACKFILL into the vacuumed batch is refused loudly by
    *     [[applyBatch]] (re-freezing from a redelivered frame could
    *     fork the new index's content) — the same backfill-horizon
    *     trade as [[compactRevs]], so vacuum on the cadence that keeps
    *     the horizon you need.
    * Only batches with their `done` marker are touched (`keep` exempts
    * keys, e.g. the horizon you still want backfillable). Idempotent;
    * safe between applies (the serialized-applies contract). Returns
    * (key → bytes reclaimed).
    */
  def vacuumBatches(
      spark: SparkSession,
      root: String,
      keep: Set[String] = Set.empty): Map[String, Long] = {
    val batchesRoot = new Path(s"$root/batches")
    val fs = batchesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(batchesRoot)) return Map.empty
    fs.listStatus(batchesRoot).toSeq
      .filter(s => s.isDirectory && !keep(s.getPath.getName))
      .filter(s => fs.exists(new Path(s.getPath, "done")))
      .flatMap { s =>
        val victims = fs.listStatus(s.getPath)
          .filter(c => c.isDirectory &&
            (c.getPath.getName == "delta" ||
              c.getPath.getName.startsWith("stage-")))
        if (victims.isEmpty) None
        else {
          val bytes = victims.map(v =>
            fs.getContentSummary(v.getPath).getLength).sum
          victims.foreach { v =>
            if (!fs.delete(v.getPath, true))
              throw new java.io.IOException(
                s"vacuumBatches: cannot delete ${v.getPath}")
          }
          Some(s.getPath.getName -> bytes)
        }
      }.toMap
  }

  final case class MaintenanceReport(
      purged: Map[String, Map[String, (Int, Int)]],
      compacted: Map[String, Map[String, (Int, Int)]],
      vacuumedBytes: Map[String, Long],
      revsDirsBefore: Int,
      revsDirsAfter: Int)

  /** ONE quiesced-window maintenance pass for a coordinated corpus
    * root — the operational entry point that runs every layout's
    * maintenance in the order their individual contracts require,
    * instead of leaving an operator to hand-sequence five indexes ×
    * two passes + two ledger passes:
    *
    *   1. per-target PURGE (concurrently across targets — each is its
    *      own layout): the physical drop of tombstoned rows, clearing
    *      each index's tombstone set. FIRST because compaction refuses
    *      while tombstones pend, and purging first avoids rewriting
    *      the same bytes twice;
    *   2. per-target COMPACT (concurrently): fold append litter into
    *      bounded files — probe-score-identical by each layout's
    *      contract;
    *   3. [[vacuumBatches]] (keep = `keepBatches`): reclaim done
    *      batches' frozen payloads;
    *   4. [[compactRevs]] when `foldRevs` (default true): fold the rev
    *      ledger to its max-rev rows — skips loudly if a crashed batch
    *      awaits its retry.
    *
    * Horizon trades, restated: purges bound SNAPSHOT reads (superseded
    * rows are reclaimed), the vacuum and the fold bound BACKFILL and
    * as-of granularity — pass `keepBatches` / `foldRevs = false` on
    * the cadence that keeps the history you need. Idempotent end to
    * end: every stage is individually idempotent and the order is
    * data-independent, so after a crash anywhere, re-running the SAME
    * call completes the pass. Serialized with applies like every
    * maintenance operation (the quiesced-window rule).
    */
  def maintain(
      spark: SparkSession,
      root: String,
      targets: Seq[IndexTarget],
      keepBatches: Set[String] = Set.empty,
      foldRevs: Boolean = true): MaintenanceReport = {
    require(targets.map(_.name).distinct.size == targets.size,
      "maintain: duplicate target names")
    val purged = targets.map(t => t.name -> inPool(t.purge(spark)))
      .map { case (n, f) => n -> await(f) }.toMap
    val compacted = targets.map(t => t.name -> inPool(t.compact(spark)))
      .map { case (n, f) => n -> await(f) }.toMap
    val vacuumed = vacuumBatches(spark, root, keepBatches)
    val revsRoot = new Path(s"$root/revs")
    val fs = revsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def revsDirs(): Int =
      if (!fs.exists(revsRoot)) 0
      else fs.listStatus(revsRoot).count(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch="))
    val before = revsDirs()
    if (foldRevs) compactRevs(spark, root)
    MaintenanceReport(purged, compacted, vacuumed, before, revsDirs())
  }

  /** Retire documents from every target index: tombstones their
    * CURRENT revision's rid (idempotent — re-running re-appends legal
    * duplicate tombstone rows). Unknown doc ids are no-ops. The rev
    * ledger keeps the retired doc's last rev, so a later re-upsert
    * resumes at rev+1 (its rid is distinct from every tombstoned one).
    *
    * Recovery contract — the same re-run-until-it-returns rule as
    * [[applyBatch]]: a crash mid-delete leaves some targets tombstoned
    * and others not; re-running the SAME call completes the rest, and
    * the re-added tombstones on the already-done targets are legal
    * duplicates. (No marker protocol is needed because tombstone
    * appends are the only effect and they deduplicate.)
    */
  def deleteDocs(
      docIds: DataFrame,
      docCol: String,
      root: String,
      targets: Seq[IndexTarget]): Unit = {
    val spark = docIds.sparkSession
    val rids = docIds.select(col(docCol).cast("long").as("doc")).distinct()
      .join(currentRevs(spark, root), Seq("doc"))
      .select(ridExpr(col("doc"), col("rev")).as(RidCol))
      .localCheckpoint(true)
    awaitAll(targets.map(t => inPool { t.delete(rids) }))
  }

  /** The current `(doc, rev)` per document — max rev over every batch
    * ever RECORDED (a batch records its revs before its index work, so
    * mid-apply this already reports the incoming revision; it is
    * authoritative once `applyBatch` returned). Add
    * `rid = doc·2^16 + rev` via [[ridExpr]] when joining against index
    * relations.
    */
  def currentRevs(spark: SparkSession, root: String): DataFrame = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    priorRevs(spark, fs, root, excludeKey = "")
  }

  /** Decode an index/probe relation's rid column into (doc_id, rev). */
  def withDocRev(df: DataFrame, ridCol: String): DataFrame =
    df.withColumn("doc_id", docOf(col(ridCol)))
      .withColumn("rev", revOf(col(ridCol)))

  /** SNAPSHOT reads — the corpus `(doc, rev)` AS OF the completion of
    * exactly the batches in `keys`: max rev over those batches' frozen
    * `revs/batch=` rows. Because a published index row stays
    * physically present under its composite rid until a purge reclaims
    * it (a revision tombstones the OLD rid, and tombstones only hide
    * rows from live probes), the as-of rid set reproduces any
    * historical corpus state still on disk — [[snapshotFilter]]
    * post-filters an index/probe relation to it.
    *
    * The contract, precisely:
    *   - `keys` must be a PREFIX of the serialized apply order
    *     restricted to the docs it touches — equivalently, per doc the
    *     included revs must be exactly {0..max}. A gap (batch B's rev 2
    *     included without batch A's rev 1) means the requested state
    *     never existed; it is DETECTED (one ledger-sized aggregate) and
    *     refused, not silently served. Batches over disjoint docs
    *     commute, so any such set is valid regardless of order.
    *   - Every key must be `done` with its per-batch revs still
    *     unfolded: [[compactRevs]] trades the as-of horizon exactly
    *     like the backfill horizon (fold on the cadence that keeps the
    *     history you need), and a mid-apply batch has no defined state.
    *   - The PHYSICAL horizon is the purge cadence: a superseded
    *     revision's rows are tombstoned at upsert time (hidden from
    *     live probes) but remain on disk until the index's purge
    *     reclaims them — snapshot probes scan with
    *     `includeTombstoned = true` (e.g.
    *     [[HammingIndex.hammingProbeIndex]]) and reach exactly the
    *     revisions whose rows still exist. Like a lakehouse VACUUM,
    *     purging trades time-travel depth for bytes; run purges on
    *     the cadence that keeps the history you need.
    *   - TAKEDOWNS ARE PERMANENT: [[snapshotFilter]] drops every doc
    *     whose CURRENT revision is tombstoned (that is [[deleteDocs]]'
    *     signature — revision tombstones always have a successor rev
    *     in the ledger; takedown tombstones are the ledger's max),
    *     and once purged the rows are physically gone — so a snapshot
    *     read never resurrects deleted content even when `keys`
    *     predates the delete: the compliance semantics a
    *     training-data corpus needs (an erasure request must not be
    *     undone by time travel). Pinned in CorpusUpsertSpec.
    *   - Distance/containment probes (Hamming, cosine, phrase match)
    *     are per-pair arithmetic, so post-filtered results are EXACT
    *     historical results. Corpus-statistic scores need their stats
    *     recomputed over the snapshot — [[LexIndex.bm25ProbeRids]]
    *     does exactly that (df from the rid-filtered postings slice,
    *     N/avgdl from the rid-filtered doclen), so historical BM25
    *     scores are exact too; post-filtering a LIVE-stats probe gives
    *     historical membership with live scores.
    *
    * 100 TB shape: reads only the named batches' rev dirs (delta-sized
    * each), one ledger aggregate to validate, one max-rev aggregate;
    * the snapshot filter is a semi-join against a ledger-sized rid
    * relation.
    */
  def revsAsOf(
      spark: SparkSession, root: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "revsAsOf: empty batch-key set")
    require(keys.distinct.size == keys.size, "revsAsOf: duplicate keys")
    keys.foreach(k => require(!k.startsWith(CompactedKey),
      s"revsAsOf: '$k' is the compacted partition — it holds max-revs " +
        "at fold time, not a batch; as-of reads need unfolded batches"))
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    keys.foreach { k =>
      require(fs.exists(new Path(s"$root/revs/batch=$k/_SUCCESS")),
        s"revsAsOf: batch '$k' has no frozen revs — never applied, or " +
          "folded by compactRevs (the as-of horizon is the unfolded " +
          "ledger; fold on the cadence that keeps the history you need)")
      require(fs.exists(new Path(s"$root/batches/$k/done")),
        s"revsAsOf: batch '$k' recorded revs but never completed — a " +
          "mid-apply batch has no defined snapshot state")
    }
    val all = spark.read.parquet(
      keys.map(k => s"$root/revs/batch=$k"): _*)
    // historical-state validation: per doc the included revs must be
    // exactly {0..max} — a gap means some earlier batch touching this
    // doc was left out and the requested state never existed
    val bad = all.groupBy("doc")
      .agg(count(lit(1)).as("n"), max("rev").as("maxr"))
      .filter(col("n") =!= col("maxr") + 1)
      .limit(1).collect() // bounded: 0 or 1 row
    require(bad.isEmpty,
      s"revsAsOf: batch set is not a prefix of the apply order — doc " +
        s"${bad.headOption.map(_.get(0)).getOrElse("?")} has a revision " +
        "gap; include every earlier batch that touched its docs")
    all.groupBy("doc").agg(max("rev").cast("int").as("rev"))
  }

  /** Restrict an index/probe relation (keyed by `ridCol`) to the
    * snapshot [[revsAsOf]] defines — a semi-join against the as-of rid
    * set, so rows from newer revisions AND superseded older revisions
    * both drop out. `indexPath` is the probed index's root: docs whose
    * CURRENT revision sits in ITS tombstone set were taken down
    * ([[deleteDocs]]) and are excluded at EVERY revision — snapshot
    * reads must not resurrect them (see [[revsAsOf]]'s permanence
    * contract; the probe ran `includeTombstoned = true`, so the
    * superseded-revision tombstones it ignored are re-applied here by
    * the as-of semi-join itself).
    */
  def snapshotFilter(
      df: DataFrame, ridCol: String, root: String,
      keys: Seq[String], indexPath: String): DataFrame =
    df.join(asOfRids(df.sparkSession, root, keys, indexPath, ridCol),
      Seq(ridCol), "left_semi")

  /** CDC between two snapshots — one row per document whose state
    * DIFFERS between as-of(`fromKeys`) and as-of(`toKeys`): `(doc,
    * from_rev, to_rev, op)` with `op` = `insert` (doc absent from the
    * earlier snapshot, `from_rev` null) or `update` (rev advanced) —
    * the `table_changes` feed a downstream consumer replays instead of
    * re-reading the corpus. `fromKeys` must be a SUBSET of `toKeys`
    * (snapshots along one history; anything else has no well-defined
    * direction and is refused), and both sets pass [[revsAsOf]]'s full
    * validation. Takedowns are deliberately NOT in the feed: deletes
    * live on the tombstone side, never in the rev ledger, and the
    * permanence contract means a consumer must drop erased docs via
    * its own takedown channel, not discover them by diffing history.
    *
    * 100 TB shape: two delta-sized ledger reads + one doc-keyed join —
    * the feed costs what changed, not what exists.
    */
  def changesBetween(
      spark: SparkSession, root: String,
      fromKeys: Seq[String], toKeys: Seq[String]): DataFrame = {
    require(fromKeys.toSet.subsetOf(toKeys.toSet),
      s"changesBetween: fromKeys must be a subset of toKeys — " +
        s"${fromKeys.toSet -- toKeys.toSet} appear only on the FROM side, " +
        "so the two snapshots are not points on one history")
    val a = revsAsOf(spark, root, fromKeys)
      .withColumnRenamed("rev", "from_rev")
    val b = revsAsOf(spark, root, toKeys)
      .withColumnRenamed("rev", "to_rev")
    b.join(a, Seq("doc"), "left")
      .filter(col("from_rev").isNull || col("to_rev") > col("from_rev"))
      .select(col("doc"), col("from_rev"), col("to_rev"),
        when(col("from_rev").isNull, lit("insert"))
          .otherwise(lit("update")).as("op"))
  }

  /** The snapshot's rid SET (one `ridCol` column): [[revsAsOf]]'s
    * (doc, rev) as composite rids, minus every doc whose CURRENT
    * revision sits in `indexPath`'s tombstone set (a takedown — see
    * the permanence contract on [[revsAsOf]]). This is the relation
    * [[snapshotFilter]] semi-joins against and the `rids` input
    * [[LexIndex.bm25ProbeRids]] expects for historical BM25.
    */
  def asOfRids(
      spark: SparkSession, root: String, keys: Seq[String],
      indexPath: String, ridCol: String = RidCol): DataFrame = {
    val asOf = revsAsOf(spark, root, keys)
      .select(ridExpr(col("doc"), col("rev")).as(ridCol))
    Tombstones.ids(spark, indexPath, ridCol) match {
      case Some(t) =>
        // taken-down docs: tombstoned rid = the doc's CURRENT rid
        val takenDocs = t.join(
            currentRevs(spark, root)
              .select(ridExpr(col("doc"), col("rev")).as(ridCol)),
            Seq(ridCol), "left_semi")
          .select(docOf(col(ridCol)).as("doc"))
        asOf.join(takenDocs,
          docOf(asOf(ridCol)) === takenDocs("doc"), "left_anti")
      case None => asOf
    }
  }

  /** Fold the rev ledger to its current max-rev rows — the
    * maintenance pass the per-batch `revs/batch=<key>` dirs need on a
    * long-lived root (one dir per batch ever applied, like any ledger
    * litter). Staged write → swap into `batch=$CompactedKey`, then the
    * superseded batch dirs are deleted; a crash between the swap and
    * the deletes leaves duplicates whose max-rev fold is identical
    * (re-run to finish the deletes), so the pass is idempotent and
    * rev lookups are correct in every interleaving. Run it in the
    * quiesced maintenance window (no concurrent applyBatch — the
    * serialized-applies contract already says so). A crashed batch
    * awaiting its retry (revs recorded, no done marker) is detected
    * and makes the pass SKIP (stderr note, no fold): folding an
    * incomplete batch's already-recorded revs into the compacted
    * partition would defeat the retry's self-excluding lookup — the
    * retry would see its own prior assignment under the compacted key
    * and bump the rev again, diverging from its crashed attempt's
    * already-staged index rows. The compacted partition participates
    * in later batches' self-excluding lookups like any other batch.
    */
  def compactRevs(spark: SparkSession, root: String): Unit = {
    val revsRoot = new Path(s"$root/revs")
    val fs = revsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(revsRoot)) return
    val old = fs.listStatus(revsRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
    if (old.size <= 1) return
    // a CRASHED batch awaiting its retry (revs recorded, no done
    // marker) must keep its own batch= dir: folding it into the
    // compacted partition would defeat the retry's self-excluding
    // lookup — the retry would see its OWN prior assignment under the
    // compacted key and bump every rev a second time, diverging from
    // the index rows its crashed attempt already staged or published.
    // Skip the pass entirely while one pends (it resolves on retry;
    // the next fold proceeds). The compacted partitions themselves
    // have no batch dir — exempt.
    val pending = old.map(_.getName.stripPrefix("batch=")).filter(k =>
      k != CompactedKey && k != s"$CompactedKey-old" &&
        !fs.exists(new Path(s"$root/batches/$k/done")))
    if (pending.nonEmpty) {
      System.err.println(s"[graft] compactRevs: skipped — batch(es) " +
        s"${pending.mkString(", ")} recorded revs but never completed; " +
        "re-run their applyBatch to completion first")
      return
    }
    val stage = new Path(revsRoot, s".revs_compact")
    priorRevs(spark, fs, root, excludeKey = "")
      .select(col("doc"), col("rev").cast("int").as("rev"))
      .coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    val dest = new Path(revsRoot, s"batch=$CompactedKey")
    val aside = new Path(revsRoot, s"batch=$CompactedKey-old")
    // a LEFTOVER aside dir (a prior pass crashed between its publish
    // and its deletes) goes first: its rows were just folded into the
    // freshly staged result by the excludeKey = "" scan above, and
    // rename-onto-existing fails on local FS (nests on HDFS), so the
    // documented re-run-to-finish recovery would otherwise wedge here
    // on every retry
    if (fs.exists(aside) && !fs.delete(aside, true))
      throw new java.io.IOException(
        s"compactRevs: cannot delete leftover $aside")
    // an earlier compacted partition (already folded into the stage)
    // moves ASIDE — still a visible batch= dir, so no crash point ever
    // hides its rows from a lookup; duplicates fold identically under
    // the max-rev aggregation until the final deletes land
    if (fs.exists(dest) && !fs.rename(dest, aside))
      throw new java.io.IOException(s"compactRevs: cannot move $dest aside")
    if (!fs.rename(stage, dest))
      throw new java.io.IOException(s"compactRevs: cannot publish $stage -> $dest")
    (old.filterNot(p => p.getName == dest.getName) :+ aside).foreach { p =>
      if (fs.exists(p) && !fs.delete(p, true))
        throw new java.io.IOException(s"compactRevs: cannot delete superseded $p")
    }
  }

  /** The reserved batch key the compacted rev rows live under — [[
    * applyBatch]] refuses it as a caller key so a compaction can never
    * collide with a live batch.
    */
  val CompactedKey = "graft-compacted"

  /** Max-rev per doc over every revs batch except `excludeKey` (the
    * caller's own partition, for retry-stable assignment). Batch dirs
    * are read as explicit paths — no partition-type inference to
    * mistype a date-like batch key.
    */
  private def priorRevs(
      spark: SparkSession,
      fs: FileSystem,
      root: String,
      excludeKey: String): DataFrame = {
    val revsRoot = new Path(s"$root/revs")
    val dirs =
      if (!fs.exists(revsRoot)) Seq.empty[String]
      else fs.listStatus(revsRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .filter(s => s.getPath.getName != s"batch=$excludeKey")
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rev",
            org.apache.spark.sql.types.IntegerType))))
    else
      spark.read.parquet(dirs: _*)
        .groupBy("doc").agg(max("rev").as("rev"))
  }

  /** Publish a complete stage (`_graft_staged` present) into the live
    * index root: every visible staged file moves — one atomic rename
    * each — to `<index>/<same relative dir>/graft-ups-<key>-<staged
    * name>`. Names derive from the staged files' OWN names, so a
    * replayed half-publish finishes the remaining files without
    * renumbering (the moved ones are simply gone from the stage).
    */
  private def publishStage(
      fs: FileSystem, stageDir: Path, destRoot: Path, key: String): Unit = {
    require(fs.exists(new Path(stageDir, "_graft_staged")),
      s"publishStage: $stageDir has no _graft_staged marker")
    def walk(dir: Path, rel: List[String]): Unit =
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          if (!n.startsWith(".") && !n.startsWith("_"))
            walk(st.getPath, rel :+ n)
        } else if (!n.startsWith("_") && !n.startsWith(".")) {
          val destDir = rel.foldLeft(destRoot)(new Path(_, _))
          if (!fs.exists(destDir) && !fs.mkdirs(destDir))
            throw new java.io.IOException(
              s"publishStage: cannot create $destDir")
          val dest = new Path(destDir, s"graft-ups-$key-$n")
          if (!fs.exists(dest)) {
            if (!fs.rename(st.getPath, dest))
              throw new java.io.IOException(
                s"publishStage: cannot publish ${st.getPath} -> $dest")
          } else if (!fs.delete(st.getPath, false))
            throw new java.io.IOException(
              s"publishStage: $dest already published but stale stage " +
                s"file ${st.getPath} cannot be deleted")
        }
      }
    walk(stageDir, Nil)
  }

  private def touch(fs: FileSystem, p: Path): Unit = {
    if (!fs.exists(p.getParent)) fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Bounded pool for the concurrent per-index blocks — daemon threads
    * so a driver shutdown never hangs on it. Spark actions are safe to
    * launch from multiple threads against one session.
    */
  private lazy val indexPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(8,
        (r: Runnable) => {
          val t = new Thread(r, "graft-upsert-index")
          t.setDaemon(true)
          t
        }))

  private def inPool[A](body: => A): scala.concurrent.Future[A] =
    scala.concurrent.Future(body)(indexPool)

  private def await[A](f: scala.concurrent.Future[A]): A =
    scala.concurrent.Await.result(f,
      scala.concurrent.duration.Duration.Inf)

  private def awaitAll(fs: Seq[scala.concurrent.Future[_]]): Unit =
    fs.foreach(await(_))
}
