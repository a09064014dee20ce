package graft.tools
import graft._
import graft.ops._
import org.apache.spark.sql.functions._
object Prof {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  /** Total shuffle-write bytes of every stage run inside `f` (listener
    * sums per-stage metrics; wait drains the listener bus).
    */
  def shuffleBytes[A](spark: org.apache.spark.sql.SparkSession, label: String)(f: => A): A = {
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        total.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = f
      // listener bus is async: poll until the byte count stops moving
      // (a fixed sleep undercounts when the bus lags a big run)
      var last = -1L
      var stableFor = 0
      while (stableFor < 3) { // 3 × 300 ms of no movement
        Thread.sleep(300)
        val now = total.get
        if (now == last) stableFor += 1 else { stableFor = 0; last = now }
      }
      println(f"[prof] $label%-28s shuffle-write ${total.get / 1024.0 / 1024.0}%8.2f MiB")
      r
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("prof", Sessions.cpusFromEnv(32))
    val docs = Tables.load(spark, dir, "documents")
    t("warmup count")(docs.count())
    // Exact-dedup exchange: text-keyed groupBy vs 128-bit-hash winner
    // election (the q20 plan). AQE broadcast of the winners side is
    // disabled here so the measured bytes are the cluster-scale shape.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    shuffleBytes(spark, "dedup groupBy(text)") {
      t("dedup groupBy(text)")(
        docs.groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
          .count())
    }
    shuffleBytes(spark, "dedup hash-key full width") {
      t("dedup hash-key full width")(
        // noop projection defeats count()'s column pruning so the
        // winner join genuinely carries the text column (the floor for
        // any formulation whose OUTPUT includes the content).
        Dedup.exact(docs, "doc_id", Seq("text"))
          .select(length(col("text")).as("l")).agg(sum("l")).collect())
    }
    shuffleBytes(spark, "dedup hash-key id-only (q20)") {
      t("dedup hash-key id-only (q20)")(
        Dedup.exact(docs, "doc_id", Seq("text"))
          .select("doc_id", "dup_count").count())
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val sets = docs.select(col("doc_id"), TextFunctions.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    t("shingleSet compute")(sets.count())
    t("shingleSet again")(sets.count())
    val sig = sets.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 32).as("sig"))
    t("minhash sigs")(sig.count())
    val buckets = sets.select(col("doc_id"), explode(Dedup.lshBands(Dedup.minhashSignature(col("sh"), 32), 8, 4)).as("bb"))
    t("buckets")(buckets.count())
    t("full q21 pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5).count())
    t("full q22 pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
