package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file-layout clustering (Z-order), the data-skipping
  * lever for tables queried along MORE THAN ONE column: a linear sort
  * gives one column tight per-file min/max ranges and leaves every other
  * column's ranges as wide as the table, while sorting by the
  * interleaved-bit Z-value bounds every interleaved dimension at once,
  * so parquet row-group / partition min-max pruning works for predicates
  * on either column.
  *
  * The engine side is just `repartitionByRange(z) .sortWithinPartitions
  * (z) .write`: Spark's range partitioner samples the z distribution, so
  * files tile the Z-curve evenly even when the dimensions are skewed.
  */
object Layout {

  /** Z-value (Morton code) of two non-negative integer dimensions: the
    * low `bits` bits of `a` and `b`, interleaved (a takes even output
    * positions, b odd). Monotone locality: points close in (a, b) are
    * close in z, which is what makes per-file z ranges bound BOTH
    * dimensions.
    *
    * Bits above `bits` are deliberately DROPPED (callers bucket or mod
    * their dimensions first — a require here would force a scan). With
    * `bits` ≤ 31 the result fits comfortably in a long, so arithmetic
    * is exact in any engine. Unrolled into a literal OR-chain of
    * shift/mask terms: plain built-ins, whole-stage-codegen'd, and
    * expressible verbatim in an oracle dialect.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits must be in [1, 31]")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` on the Z-curve of two bucketed dimensions: range
    * partition by z into `numFiles` partitions (each the image of one
    * output file), sorted within. The write itself is the caller's —
    * this returns the laid-out frame so the suite can assert the
    * min/max-range property without touching disk.
    *
    * Precondition that matters in practice: bucket the two dimensions
    * to COMPARABLE cardinality first (quantile or modulo buckets). If
    * one dimension carries many more significant bits than the other,
    * its high bits dominate the curve and the layout degenerates to a
    * linear sort on the wide dimension (LayoutSpec demonstrates both
    * regimes).
    */
  def zOrderBy(
      df: DataFrame,
      a: Column,
      b: Column,
      bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles=$numFiles must be >= 1")
    val z = Dedup.freshName(df, "_graft_z")
    df.withColumn(z, zValue(a, b, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** Per-partition (min, max) spans of a column — the data-skipping
    * figure of merit a writer would persist as file statistics. Returns
    * one row per partition: (partition, lo, hi). Driver-safe: one value
    * pair per partition.
    */
  def partitionSpans(df: DataFrame, dim: Column): DataFrame =
    df.select(spark_partition_id().as("partition"), dim.as("d"))
      .groupBy("partition")
      .agg(min("d").as("lo"), max("d").as("hi"))
}
