package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into fixed-token-budget bins
  * (training batches / context windows) so short documents share a
  * sequence instead of wasting pad tokens.
  *
  * Algorithm: next-fit greedy per partition — docs are HASH-partitioned
  * on id and sorted by id within each partition, then a single forward
  * pass opens a new bin whenever the next doc would overflow the
  * budget. Packing never crosses partitions, so the pass is
  * embarrassingly parallel and one doc's bin is decided by O(1) state.
  * Hash partitioning (murmur3 of the id value) is chosen over
  * repartitionByRange deliberately: range boundaries come from a
  * reservoir SAMPLE seeded per-run, so they jitter between executions
  * on corpora larger than the sample — hash placement is a pure
  * function of (id, partitions), making bin assignments reproducible
  * run to run and independent of input file layout.
  * A doc longer than the budget gets a bin of its own (callers truncate
  * or split upstream; silently dropping data is not this operator's
  * call). Fill loss vs bin-optimal is bounded per bin boundary by the
  * largest doc and measured in PackingSpec; at 100 TB the win over
  * optimal packing is irrelevant next to never shuffling doc text —
  * only (id, n_tokens) pairs move.
  */
object Packing {

  private def assertNotNull(c: org.apache.spark.sql.Column, name: String) =
    when(c.isNull, raise_error(lit(
      s"packGreedy: NULL or uncastable `$name` value — filter or repair ids/token counts upstream"
    ))).otherwise(c)

  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      partitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // Fail readably: a NULL id/token (or an uncastable string — cast
    // yields NULL) would otherwise NPE inside the primitive-Long encoder
    // as an opaque executor-side codegen failure.
    df.select(col(idCol).cast("long").as(idCol), col(tokenCol).cast("long").as(tokenCol))
      .select(
        assertNotNull(col(idCol), idCol).as(idCol),
        assertNotNull(col(tokenCol), tokenCol).as(tokenCol))
      .as[(Long, Long)]
      .repartition(partitions, col(idCol))
      .sortWithinPartitions(idCol)
      .mapPartitions { iter =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var bin = 0L
        var fill = 0L
        iter.map { case (id, tok) =>
          if (fill > 0 && fill + tok > budget) { bin += 1; fill = 0L }
          fill += tok
          (id, (pid << 32) | bin, tok)
        }
      }
      .toDF(idCol, "bin_id", "n_tokens")
  }
}
