package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted multi-index Hamming index over [[VectorOps.binaryQuantize]]
  * sign codes — the binary member of the persisted-index family
  * ([[VectorOps]] exact-IVF, [[Pq]] IVF-PQ, [[LexIndex]] BM25): build
  * once, append deltas, probe radius queries without rescanning the
  * corpus.
  *
  * Layout under the index root (Norouzi et al. 2012's m hash tables,
  * as partition directories):
  *   - `bands/` — (band, bv, <idCol>, code), one row per (vector,
  *     band), partitioned by `band` and `bb = bv mod nBuckets`: a
  *     radius probe prunes to its probe values' (band, bucket)
  *     directories AT FILE LISTING — the [[LexIndex.bm25ProbeIndex]]
  *     term-bucket treatment. The full code rides along so the exact
  *     check needs no second corpus join. Space is the standard MIH
  *     trade: nBands copies of the (tiny) codes, never of the vectors.
  *   - `meta/` — (nBands, dim, nBuckets): the band geometry
  *     ([[VectorOps.BandSpec]]), persisted so append/probe can never
  *     split a code differently than the index was written under.
  *
  * Append contract (the [[VectorOps.ivfAppendIndex]] one): delta ids
  * are NEW — band rows stay unique per (band, id), so append ≡
  * from-scratch rebuild gives identical probe results (HammingSpec
  * pins it). [[hammingCompactIndex]] folds append litter in place via
  * the shared [[Compaction.compactDirs]] publish protocol with
  * bit-identical probes.
  *
  * 100 TB shape: the build is one map-only pack+explode pass written
  * through a (band, bucket) partitioner; a probe packs the query
  * batch, expands the per-band radius-⌊r/m⌋ probe balls, prunes the
  * index scan to those (band, bucket) directories, broadcasts the
  * probe rows against the pruned index slice, and pays one native
  * XOR+POPCNT exact check per candidate. Candidate volume is the MIH
  * bucket-collision term — [[VectorOps.hammingRadiusPairs]]'s
  * documented tradeoff; size `nBands`/`nBuckets` with
  * [[VectorOps.hammingParamsFor]], which prices the collision term
  * from (n, dim, radius) and refuses infeasible combinations.
  */
object HammingIndex {

  /** `dim` < 0 derives the dimension from the data; pass it explicitly
    * to bootstrap an EMPTY index whose geometry a stream then appends
    * under (the [[LexIndex.bm25WriteIndex]]-over-`limit(0)` stream
    * pattern — an empty frame has no row to derive from).
    */
  def hammingWriteIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nBands: Int = 8,
      nBuckets: Int = 64,
      dim: Int = -1): Unit = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be >= 1")
    val d = if (dim > 0) dim else {
      val rows = df.select(size(col(vecCol)).as("d")).limit(1).collect()
      require(rows.nonEmpty, "hammingWriteIndex: empty input — pass dim " +
        "explicitly to bootstrap an empty index for a stream")
      rows.head.getInt(0)
    }
    val dimV = d
    VectorOps.BandSpec(nBands, dimV) // validate geometry before any write
    import df.sparkSession.implicits._
    Seq((nBands, dimV, nBuckets)).toDF("nBands", "dim", "nBuckets")
      .write.mode("overwrite").parquet(s"$path/meta")
    writeBands(df, idCol, vecCol, path, nBands, dimV, nBuckets,
      overwrite = true)
  }

  /** Append a delta of NEW vectors (new ids) under the persisted band
    * geometry. `coPartition` (default true) shuffles the band rows to
    * the (band, bb) directory layout before the write — ≤ one file per
    * touched dir per append instead of tasks×dirs. The steady-state
    * numbers that made this the DEFAULT (tools/GateSteadyProbe, 128k
    * codes / 32 batches): without it every append wrote 2,048 files
    * (32 tasks × 64 dirs), probe latency grew linearly with the litter
    * (3.4 s fresh → 25.3 s at 65k files) and the eventual compaction
    * of 65k files cost 113 s — the shuffle it adds is delta-sized.
    * Pass false for a corpus-scale delta where the layout's partition
    * count would bottleneck write parallelism (then compact on the
    * normal cadence).
    */
  def hammingAppendIndex(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      coPartition: Boolean = true): Unit = {
    val (nBands, dim, nBuckets) = readMeta(delta.sparkSession, path)
    writeBands(delta, idCol, vecCol, path, nBands, dim, nBuckets,
      overwrite = false, coPartition = coPartition)
  }

  /** The [[graft.ops.CorpusUpsert]] staging hook: the delta's band
    * rows under the REAL index's persisted geometry, written to a
    * staging root mirroring the index layout (`bands/band=/bb=`) —
    * published into the live index by file rename, never by a direct
    * append.
    */
  private[ops] def stageAppend(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      stagePath: String): Unit = {
    val (nBands, dim, nBuckets) = readMeta(delta.sparkSession, indexPath)
    // co-partition the band rows with the directory layout before the
    // dynamic-partition write: without this every input task opens a
    // writer per (band, bb) dir it touches — up to tasks×nBands×nBuckets
    // small files per batch (measured 4–5 s of the upsert stage wall at
    // 256 dirs), all of which the publish then renames one by one. One
    // delta-sized shuffle cuts it to ≤ one file per touched dir.
    writeBands(delta, idCol, vecCol, stagePath, nBands, dim, nBuckets,
      overwrite = true, coPartition = true)
  }

  private def readMeta(spark: SparkSession, path: String): (Int, Int, Int) =
    MetaCache.cached(spark, s"$path/meta") {
      val m = spark.read.parquet(s"$path/meta")
        .select("nBands", "dim", "nBuckets").head()
      (m.getInt(0), m.getInt(1), m.getInt(2))
    }

  private def writeBands(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nBands: Int,
      dim: Int,
      nBuckets: Int,
      overwrite: Boolean,
      coPartition: Boolean = false): Unit = {
    val spec = VectorOps.BandSpec(nBands, dim)
    val mode = if (overwrite) "overwrite" else "append"
    val rows = VectorOps.binaryQuantize(df, idCol, vecCol)
      .select(col(idCol), col("code"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bv", spec.bandVal(col("code"), col("band")))
      .withColumn("bb", pmod(col("bv"), lit(nBuckets.toLong)).cast("int"))
    val laidOut =
      if (overwrite)
        // builds co-partition to the layout with a scale-adaptive salt
        // ([[DirLayout.toDirs]]): the exchange is build-sized, file
        // creation parallelizes across tasks, and files per directory
        // stay bounded — measured 4.1 s → ~0.6 s on the gate build
        DirLayout.toDirs(rows, nBands * nBuckets, col(idCol),
          col("band"), col("bb"))
      else if (coPartition)
        DirLayout.appendToDirs(rows, nBands * nBuckets,
          col("band"), col("bb"))
      else rows
    laidOut.write.mode(mode).partitionBy("band", "bb")
      .parquet(s"$path/bands")
  }

  /** Fold append litter back into a bounded file layout — the
    * [[LexIndex.bm25CompactIndex]] maintenance pass for the band
    * layout. Rows are unchanged, so probe results are identical before
    * and after (HammingSpec pins it). Returns per-compacted-directory
    * (files before, after).
    */
  def hammingCompactIndex(
      spark: SparkSession,
      path: String,
      maxFilesPerDir: Int = 8,
      targetBytes: Long = 128L << 20): Map[String, (Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val bands = new Path(s"$path/bands")
    val fs = bands.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leafDirs = fs.listStatus(bands)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("band="))
      .flatMap(b => fs.listStatus(b.getPath))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bb="))
      .map(_.getPath).toSeq
    Compaction.compactDirs(spark, leafDirs, maxFilesPerDir, targetBytes,
      "hammingCompactIndex")
  }

  /** Tombstone ids out of the index ([[Tombstones]] — the
    * persisted-index delete lifecycle): append-only, O(|ids|), safe
    * next to concurrent probes. Probes exclude the set immediately;
    * [[hammingPurgeIndex]] is the physical drop of the nBands band
    * rows per deleted vector.
    */
  def hammingDeleteIds(ids: DataFrame, idCol: String, path: String): Unit =
    Tombstones.add(ids, idCol, path)

  /** Physically drop tombstoned vectors' band rows and clear the
    * tombstone set. A deleted vector holds one row in each of its
    * nBands (band, bucket) directories; the affected-directory list
    * comes from one column-pruned (id, band, bb) semi-join — ≤
    * nBands·nBuckets pairs — and only those leaves rewrite, through
    * the shared [[Compaction.rewriteDirs]] publish protocol.
    * Quiesced-window maintenance, idempotent across crashes.
    */
  def hammingPurgeIndex(
      spark: SparkSession,
      path: String,
      idCol: String,
      targetBytes: Long = 128L << 20): Map[String, (Int, Int)] =
    Tombstones.purge(spark, path, idCol,
      candidateDirs = Seq.empty,
      affectedOf = (tombs, _) => {
        import org.apache.hadoop.fs.Path
        spark.read.parquet(s"$path/bands")
          .select(col(idCol), col("band"), col("bb"))
          .join(tombs, Seq(idCol), "left_semi")
          .select("band", "bb").distinct()
          .collect() // ≤ nBands·nBuckets pairs
          .map(r => new Path(s"$path/bands/band=${r.getInt(0)}/bb=${r.getInt(1)}"))
          .toSeq
      },
      targetBytes = targetBytes, opName = "hammingPurgeIndex")

  /** EXACT radius search served from the index: every `(q_id, n_id,
    * hamming)` with distance ≤ `radius` between a query-batch row and
    * an indexed vector — [[VectorOps.hammingRadiusPairs]]'s guarantee
    * through the persisted layout (probing the index with its own
    * corpus and keeping `q_id < n_id` reproduces the pair relation
    * exactly; HammingSpec pins both). The index scan prunes to the
    * probe values' (band, bucket) directories at file listing.
    * Tombstoned ids ([[hammingDeleteIds]]) are excluded from the
    * scanned slice (never from the caller's query batch — a deleted
    * vector can still be ASKED about; it just can't be FOUND).
    *
    * `includeTombstoned = true` keeps tombstoned rows in the scan —
    * the SNAPSHOT-read mode ([[CorpusUpsert.snapshotFilter]]): a
    * superseded revision's rows are tombstoned but still physically
    * present until a purge, and Hamming distance is per-pair
    * arithmetic, so post-filtering these results by an as-of rid set
    * gives exact historical results. (The same one-line treatment
    * applies to any layout whose probe is per-pair.)
    */
  /** `pruneListing = false` skips the probe-bucket collect and scans
    * every (band, bucket) directory: right for CORPUS-SCALE query
    * batches (the self-probe pair relation), whose probe balls cover
    * essentially every directory anyway — there the collect is a full
    * extra quantize+explode pass over the queries that prunes nothing
    * (measured ~0.6 s of the q193 probe at sf0.1). Keep the default
    * for the ingest-gate shape (small batch vs huge corpus), where the
    * pruned listing is the whole point.
    */
  def hammingProbeIndex(
      spark: SparkSession,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      radius: Int,
      includeTombstoned: Boolean = false,
      pruneListing: Boolean = true): DataFrame = {
    val (nBands, dim, nBuckets) = readMeta(spark, path)
    val spec = VectorOps.BandSpec(nBands, dim)
    val s = spec.probeBits(radius)
    val probes = VectorOps.binaryQuantize(queries, idCol, vecCol)
      .select(col(idCol).as("q_id"), col("code").as("qcode"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bv",
        explode(spec.probeBall(spec.bandVal(col("qcode"), col("band")), s)))
      .withColumn("bb", pmod(col("bv"), lit(nBuckets.toLong)).cast("int"))
    // (band, bucket) pairs to prune the listing to: bounded by
    // |queries|·nBands·(1+cb) and by nBands·nBuckets
    val prune = if (!pruneListing) lit(true) else {
      val probeBuckets = probes.select("band", "bb").distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      require(probeBuckets.nonEmpty, "hammingProbeIndex: empty query batch")
      probeBuckets
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toSeq
        .map { case (band, bbs) =>
          col("band") === band && col("bb").isin(bbs: _*)
        }
        .reduce(_ || _)
    }
    // deliberately NO broadcast hint on the probe side: a query BATCH
    // broadcasts from AQE's runtime stats, but the probe contract also
    // serves corpus-as-queries (q146's pair relation), where a forced
    // broadcast would ship |corpus|·nBands·(1+cb) rows to every task —
    // the round-12 probe measured 18.9× vs 8.6× at 64× for exactly
    // that hint before it was removed
    val slice = spark.read.parquet(s"$path/bands").filter(prune) // pruned
    (if (includeTombstoned) slice
     else Tombstones.excludeFrom(slice, path, idCol))
      .join(probes, Seq("band", "bv", "bb"))
      .select(col("q_id"), col(idCol).as("n_id"),
        graft.functions.GraftFunctions.hamming(col("qcode"), col("code"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= radius)
      .groupBy("q_id", "n_id")
      .agg(first("hamming").as("hamming"))
  }
}
