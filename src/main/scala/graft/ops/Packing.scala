package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into fixed-token-budget bins
  * (training batches / context windows) so short documents share a
  * sequence instead of wasting pad tokens.
  *
  * Algorithm: next-fit greedy per range-partition — docs are range-
  * partitioned and sorted by id, then a single forward pass opens a new
  * bin whenever the next doc would overflow the budget. Packing never
  * crosses partitions, so the pass is embarrassingly parallel and one
  * doc's bin is decided by O(1) state; determinism comes from range
  * partitioning + in-partition sort (NOT from input file layout —
  * `partitions` is an explicit parameter for exactly that reason).
  * A doc longer than the budget gets a bin of its own (callers truncate
  * or split upstream; silently dropping data is not this operator's
  * call). Fill loss vs bin-optimal is bounded per bin boundary by the
  * largest doc and measured in PackingSpec; at 100 TB the win over
  * optimal packing is irrelevant next to never shuffling doc text —
  * only (id, n_tokens) pairs move.
  */
object Packing {

  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      partitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(partitions, col(idCol))
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
