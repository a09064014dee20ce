package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Measures how the core plans scale: derives k-fold enlarged copies of
  * lineitem/events in /tmp (ids shifted per replica so keys stay unique)
  * and times representative queries at 1x vs kx. Near-linear growth =
  * the plan has no hidden quadratic/skew term at this range.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(8)
    val dir = "/root/testdata/sf0.1"
    val spark = Sessions.local("scaleprobe", Sessions.cpusFromEnv(32))
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale").toString

    val li = Tables.load(spark, dir, "lineitem")
    val maxOk = li.agg(max("l_orderkey")).head().getLong(0) + 1
    (0 until k).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOk)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val ev = Tables.load(spark, dir, "events")
    val maxEid = ev.agg(max("event_id")).head().getLong(0) + 1
    // offset by the true id range — a constant below max(user_id) would
    // merge adjacent replicas' users and inflate per-user join/session
    // density beyond pure replication
    val maxUid = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until k).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i * maxEid))
        .withColumn("user_id", col("user_id") + lit(i * maxUid)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // documents: replicas get offset ids and a replica-unique tail token
    // (so replicas are near- but not exact duplicates). Pair-relation
    // queries (q22/q66) are deliberately NOT probed on this corpus:
    // replicating a corpus k× genuinely grows its near-dup relation ~k²
    // — that would measure the data change, not the plan.
    val docs = Tables.load(spark, dir, "documents")
    val maxDid = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until k).map { i =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(i * maxDid))
      // replica 0 stays byte-identical to the 1x baseline so the ratio
      // measures replication, not a per-doc text change
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" replica$i")))
    }
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // dims unchanged
    Seq("orders", "customer", "nation", "region", "part", "supplier",
      "embeddings").foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$tmp/$t.parquet"),
        java.nio.file.Paths.get(s"$dir/$t.parquet"))
    }

    def time(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("q10_pricing_summary", "q51_selective_revenue",
        "q02_daily_count", "q42_sessionization_batch", "q15_window_topn",
        "q63_attribution_batch", "q64_tfidf_topterms", "q65_quota_sample",
        "q67_repetition", "q68_pack_sequences")) {
      time(q, dir) // warm
      val t1 = time(q, dir)
      val tk = time(q, tmp)
      println(f"[scale] $q%-28s 1x=${t1}%6.2fs ${k}x=${tk}%6.2fs ratio=${tk / t1}%5.2f")
    }
    spark.stop()
  }
}
