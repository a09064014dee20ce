package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-to-layout helper for from-scratch index BUILDS that write
  * through `partitionBy` into a fixed directory fanout (Hamming
  * (band, bb), NearDup (band, bb)/(db), BM25 tb): without it a build's
  * map tasks each open one writer per directory they touch — at gate
  * scale a SINGLE scan task (tiny one-row-group parquet input) creates
  * all nBands×nBuckets files sequentially, which the round-17 probe
  * measured as ~95% of the Hamming build wall (quantize+explode 0.16 s
  * vs 4.1 s build).
  *
  * The repartition is keyed by the layout columns PLUS a deterministic
  * id-derived salt sized so write parallelism survives at cluster
  * scale: slices = max(1, shufflePartitions / dirCount). On the gate
  * box (32 shuffle partitions, 256 dirs) that degenerates to a plain
  * (band, bb) repartition — one exchange, ≤1 file per dir, file
  * creation spread across every core. On a cluster sized with
  * shufflePartitions ≫ dirCount, the salt keeps
  * shufflePartitions-way write parallelism with ≤slices files per
  * directory per build (bounded, compaction-friendly). The salt is
  * derived from the id column, never rand() — a retried map task must
  * reproduce its row-to-partition assignment (SPARK-38388).
  */
object DirLayout {

  /** The partition COUNT is explicit in every repartition here:
    * a bare `repartition(cols…)` is AQE-coalescible, and at gate scale
    * AQE folds the tiny exchange into ONE partition — putting all
    * nBands×nBuckets file creations back on a single task (measured:
    * the 256-file Hamming build write stayed ~4 s until the explicit
    * count pinned 32 writer tasks). An explicit count is exactly what
    * the layout wants anyway: ≤1 writer task per directory slice.
    */
  private[ops] def toDirs(
      df: DataFrame,
      dirCount: Int,
      idSalt: Column,
      layoutCols: Column*): DataFrame = {
    val p = shufflePartitions(df)
    val slices = math.max(1, p / math.max(1, dirCount))
    val n = math.min(p, dirCount * slices)
    if (slices <= 1) df.repartition(n, layoutCols: _*)
    else df.repartition(n,
      (layoutCols :+ pmod(xxhash64(idSalt), lit(slices.toLong))): _*)
  }

  /** Append/stage-path co-partition: ≤ 1 file per touched directory
    * per batch (the steady-state litter contract), with file creation
    * spread across min(shufflePartitions, dirCount) writer tasks
    * instead of whatever single partition AQE coalesces a bare
    * column repartition into.
    */
  private[ops] def appendToDirs(
      df: DataFrame,
      dirCount: Int,
      layoutCols: Column*): DataFrame =
    df.repartition(
      math.max(1, math.min(shufflePartitions(df), dirCount)),
      layoutCols: _*)

  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(_.toIntOption).getOrElse(200)

  /** Spread a CPU-heavy map stage's input across the session's
    * parallelism when the SCAN degenerated to a handful of partitions —
    * the guide §2.5 "unsplittable input" treatment: at gate scale the
    * corpus tables are single-row-group parquet, so tokenize/hash/
    * shingle projections over them run as ONE task regardless of core
    * count (measured: the q120 feature build spent ~2 s single-
    * threaded). A no-op whenever the scan already parallelizes (real
    * multi-split inputs at cluster scale — no shuffle is added there);
    * when it fires, the exchange carries the raw rows once and
    * identical downstream exchanges are deduplicated by ReuseExchange.
    * The count is explicit so AQE cannot coalesce the spread away
    * (the [[toDirs]] lesson).
    */
  private[ops] def spread(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= p) df
    else df.repartition(p, key)
  }
}
