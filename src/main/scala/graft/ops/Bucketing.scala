package graft.ops

import org.apache.spark.sql.DataFrame

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
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
