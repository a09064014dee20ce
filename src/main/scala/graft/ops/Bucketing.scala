package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-layout co-location: pre-shuffle a table ONCE at write time so
  * every subsequent equi-join or aggregation on the bucket key runs with
  * no exchange at all.
  *
  * This is the 100 TB answer to repeated fact-fact joins (lineitem ⋈
  * orders on orderkey): the per-query shuffle — the single most expensive
  * operator at that scale — is amortized into the write path. Both sides
  * must share the bucket count and key; `sortBy` additionally pre-sorts
  * within buckets so sort-merge join skips its sort. BucketingSpec proves
  * the exchange-free plan and result parity.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    // repartition on the bucket key FIRST: without it every write task
    // emits up to one file per bucket value it holds (tasks × buckets
    // small files — the exact small-file explosion bucketing exists to
    // avoid); pre-partitioned, each bucket is one task's one file, and
    // the in-partition sort feeds sortBy without a per-task spill sort.
    df.repartition(buckets, col(key))
      .sortWithinPartitions(col(key))
      .write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
