package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 lexical index — the lexical twin of the persisted
  * IVF / IVF-PQ vector indexes: build once, append deltas, probe
  * without ever rescanning the corpus.
  *
  * Layout under the index root:
  *   - `postings/` — (w, <idCol>, tf), hash-bucketed by term into
  *     `tb=<0..buckets-1>` partition directories: a probe prunes to
  *     the query terms' buckets AT FILE LISTING, the
  *     [[VectorOps.ivfProbeIndex]] treatment of the postings scan.
  *     Full-fidelity tokens (empty tokens included), so index scores
  *     reproduce the scan-path scores exactly.
  *   - `doclen/` — (<idCol>, dl), one row per document (every
  *     document, matching [[TextAnalysis.bm25Scores]]'s corpus-wide
  *     N/avgdl).
  *   - `stats/` — one (n, sum_dl) row PER WRITE: additive, so an
  *     append is a pure append here too and the probe derives
  *     N = Σn, avgdl = Σsum_dl / Σn from a table with one row per
  *     batch ever written — never a corpus pass.
  *   - `meta/` — (buckets): the term-bucket fanout, persisted so
  *     append/probe can never hash terms into a different layout than
  *     the index was written under.
  *
  * Append contract (the [[VectorOps.ivfAppendIndex]] one): delta doc
  * ids are NEW — postings/doclen rows stay unique per (term, doc) and
  * (doc), so append ≡ from-scratch rebuild gives identical probe
  * scores (LexIndexSpec pins it, plus probe ≡ the scan-path
  * bm25Scores on the same corpus).
  *
  * 100 TB shape: the build is the postings hash-agg (map-side
  * combine) plus two cheap projections; a probe reads only the query
  * terms' partition directories (|terms| buckets of `buckets`), the
  * per-term df comes from those postings, and the only joins are
  * broadcast (df, stats) plus the doclen attach on doc id. Scoring
  * arithmetic is bit-for-bit [[TextAnalysis.bm25Scores]]'s.
  */
object LexIndex {

  /** Stable term bucket: layout hash only — scores never depend on it. */
  private def termBucket(w: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(w), lit(buckets.toLong)).cast("int")

  def bm25WriteIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    import docs.sparkSession.implicits._
    Seq(buckets).toDF("buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
    writeParts(docs, idCol, textCol, path, buckets, overwrite = true)
  }

  /** Append a delta of NEW documents (new ids — the ivfAppendIndex
    * contract) under the index's persisted bucket fanout.
    */
  def bm25AppendIndex(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit =
    writeParts(delta, idCol, textCol, path,
      readBuckets(delta.sparkSession, path), overwrite = false)

  private def readBuckets(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/meta").head().getInt(0)

  private def writeParts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      buckets: Int,
      overwrite: Boolean): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), explode(toks).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("tb", termBucket(col("w"), buckets))
      .write.mode(mode).partitionBy("tb").parquet(s"$path/postings")
    docs
      .select(col(idCol), size(toks).cast("double").as("dl"))
      .write.mode(mode).parquet(s"$path/doclen")
    docs
      .agg(count(lit(1)).as("n"), sum(size(toks).cast("double")).as("sum_dl"))
      .write.mode(mode).parquet(s"$path/stats")
  }

  /** Fold append litter back into a bounded file layout — the
    * [[VectorOps.ivfCompactIndex]] maintenance pass for the lexical
    * layout: every `postings/tb=` partition, plus the flat `doclen/`
    * and `stats/` directories, holding more than `maxFilesPerDir`
    * files is rewritten to ⌈bytes / targetBytes⌉ files (same hidden-
    * rename publish protocol, shared in [[Compaction.compactDirs]]).
    * Rows — including the additive stats rows — are unchanged, so
    * probe scores are identical before and after (LexIndexSpec pins
    * it). Returns per-compacted-directory (files before, after).
    */
  def bm25CompactIndex(
      spark: SparkSession,
      path: String,
      maxFilesPerDir: Int = 8,
      targetBytes: Long = 128L << 20): Map[String, (Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val postings = new Path(s"$path/postings")
    val fs = postings.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tbDirs = fs.listStatus(postings)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("tb="))
      .map(_.getPath).toSeq
    Compaction.compactDirs(spark,
      tbDirs :+ new Path(s"$path/doclen") :+ new Path(s"$path/stats"),
      maxFilesPerDir, targetBytes, "bm25CompactIndex")
  }

  /** Tombstone documents out of the index ([[Tombstones]] — the
    * persisted-index delete lifecycle). Two writes, neither touching
    * index data:
    *
    *   1. a NEGATIVE `stats/` row (−n, −sum_dl) for the ids being
    *      deleted for the FIRST time, so the probe's corpus-wide
    *      N/avgdl (Σ over stats rows) immediately reflect the
    *      deletion — `dl` values are integer-valued doubles (token
    *      counts), so Σall − Σdeleted is exact, bit-identical to a
    *      rebuild without the ids;
    *   2. the tombstone append itself; probes anti-join it out of the
    *      postings/doclen slices they scan.
    *
    * Already-tombstoned (or never-indexed) ids contribute nothing to
    * the negative row — re-deleting is idempotent on scores.
    * [[bm25PurgeIndex]] is the physical drop.
    */
  def bm25DeleteIds(ids: DataFrame, idCol: String, path: String): Unit = {
    val spark = ids.sparkSession
    val requested = ids.select(col(idCol)).distinct()
    val fresh = Tombstones.ids(spark, path, idCol) match {
      case Some(t) => requested.join(t, Seq(idCol), "left_anti")
      case None => requested
    }
    // one row, computed BEFORE the tombstone append mutates the set
    // the anti-join above reads
    val neg = fresh
      .join(spark.read.parquet(s"$path/doclen"), Seq(idCol))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
      .head()
    if (neg.getLong(0) > 0L) {
      import spark.implicits._
      Seq((-neg.getLong(0), -neg.getDouble(1))).toDF("n", "sum_dl")
        .write.mode("append").parquet(s"$path/stats")
    }
    Tombstones.add(requested, idCol, path)
  }

  /** Physically drop tombstoned documents' postings/doclen rows and
    * clear the tombstone set — quiesced-window maintenance through the
    * shared [[Compaction.rewriteDirs]] publish protocol; only the
    * `tb=` buckets that actually hold a tombstoned doc's terms (plus
    * `doclen/`) are rewritten. The `stats/` rows are untouched: the
    * negative rows written at delete time are part of the additive
    * history and keep summing to the rebuilt-without-ids totals.
    * Idempotent across crashes (see [[Tombstones]]).
    */
  def bm25PurgeIndex(
      spark: SparkSession,
      path: String,
      idCol: String,
      targetBytes: Long = 128L << 20): Map[String, (Int, Int)] =
    Tombstones.purge(spark, path, idCol,
      candidateDirs = Seq.empty,
      affectedOf = (tombs, _) => {
        import org.apache.hadoop.fs.Path
        val affected = spark.read.parquet(s"$path/postings")
          .select(col(idCol), col("tb"))
          .join(tombs, Seq(idCol), "left_semi")
          .select("tb").distinct()
          .collect().map(_.getInt(0)) // ≤ buckets ints
        affected.map(b => new Path(s"$path/postings/tb=$b")).toSeq :+
          new Path(s"$path/doclen")
      },
      targetBytes = targetBytes, opName = "bm25PurgeIndex")

  /** BM25 scores for `queryTerms` over the persisted index — the
    * index-backed twin of [[TextAnalysis.bm25Scores]] (same robust-idf
    * Okapi formula, same rounding), returning `(<idCol>, bm25)` for
    * every document matching ≥ 1 term. The postings scan prunes to
    * the query terms' `tb=` directories at file listing. Tombstoned
    * documents ([[bm25DeleteIds]]) are excluded from the scanned slice
    * and from the per-term document frequencies.
    */
  def bm25ProbeIndex(
      spark: SparkSession,
      path: String,
      idCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25ProbeIndex: empty query-term set")
    val buckets = readBuckets(spark, path)
    // bucket routing must reproduce the WRITE path's hash exactly: do
    // it with the same Catalyst expression over a literal term table,
    // not a reimplementation of xxhash64 on the driver
    import spark.implicits._
    val termsDf = queryTerms.distinct.toDF("w")
      .withColumn("tb", termBucket(col("w"), buckets))
    val probeBuckets = termsDf.select("tb").distinct()
      .collect().map(_.getInt(0)).toSeq
    val stats0 = spark.read.parquet(s"$path/stats")
      .agg(sum("n").as("n_l"), sum("sum_dl").as("sum_dl"))
      .select(col("n_l").cast("double").as("n_docs"),
        (col("sum_dl") / col("n_l").cast("double")).as("avgdl"))
    val lens = spark.read.parquet(s"$path/doclen")
    // tombstone anti-join AFTER the bucket/term prune (slice-sized,
    // skipped when no delete ever landed); df and the doclen attach
    // inherit the exclusion through this relation
    val tf = Tombstones.excludeFrom(
      spark.read.parquet(s"$path/postings")
        .filter(col("tb").isin(probeBuckets: _*)) // partition-pruned
        .filter(col("w").isin(queryTerms.distinct: _*))
        .select(col(idCol), col("w"), col("tf")),
      path, idCol)
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val term = idf * col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), Seq("w"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats0))
      .select(col(idCol), term.as("term"))
      .groupBy(col(idCol))
      .agg(round(sum("term"), 6).as("bm25"))
  }
}
