package graft.tools

import graft._
import graft.ops.{Dedup, Similarity}
import graft.analytics.DataOpsQueries

/** Scratch probe: timing + recall for directed-probe SRP configs on the
  * sf0.1 twin corpus — calibrates srpParamsDirectedFor's cost model
  * against wall-clock before the 64× run.
  */
object DirectedProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("directedprobe", Sessions.cpusFromEnv(32))
    // "64x" builds (or reuses) the ScaleProbe-style sign-flip 64x
    // embeddings in /tmp and probes at 256k vectors — the scale where
    // the solver's (planes, tables, probes) pick actually matters.
    val dir = args.headOption match {
      case Some("64x") =>
        import org.apache.spark.sql.functions._
        val src = "/root/testdata/sf0.1"
        val out = "/tmp/graft_emb64"
        if (!new java.io.File(s"$out/embeddings.parquet").exists) {
          val emb = Tables.load(spark, src, "embeddings")
          val maxVid = emb.agg(max("vec_id")).head().getLong(0) + 1
          (0 until 64).map { i =>
            val e = emb.withColumn("vec_id", col("vec_id") + lit(i * maxVid))
            if (i == 0) e
            else e.withColumn("embedding",
              transform(col("embedding"), (x, d) =>
                when(pmod(xxhash64(lit(i), d), lit(2)) === 0, x).otherwise(-x)))
          }.reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        }
        out
      case Some(d) => d
      case None => "/root/testdata/sf0.1"
    }
    val corpus = DataOpsQueries.twinCorpus(Tables.load(spark, dir, "embeddings"))
    val n = corpus.count()
    println(s"[probe] corpus n=$n")
    // at 64x the exact quadratic ground truth is unaffordable; recall
    // is construction-known (one twin per vector) — compare pair counts
    // against n/2 instead
    val exact =
      if (n > 100000) n / 2
      else Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9).count()
    println(s"[probe] exact relation pairs=$exact")
    def run(label: String, planes: Int, tables: Int, probePlanes: Int): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = Similarity.srpNearDupPairs(corpus, "vec_id", "embedding", 0.9,
          planes = planes, tables = tables, probePlanes = probePlanes).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      once() // warm
      val (t, c) = once()
      println(f"[probe] $label%-34s planes=$planes%2d tables=$tables%2d pp=$probePlanes%2d " +
        f"time=$t%6.2fs pairs=$c%7d recall=${c.toDouble / exact}%.4f")
    }
    val (b0, t0) = Similarity.srpParamsFor(n, 0.9)
    run("r7-auto (full probe)", b0, t0, -1)
    val (b1, t1, p1) = Similarity.srpParamsDirectedFor(n, 0.9)
    run("directed-auto", b1, t1, p1)
    // hand grid around the directed optimum: recall-solved tables for
    // each (planes, probes) neighbor, so every row meets the same
    // 0.95 boundary-recall contract and the comparison is pure cost
    for (b <- Seq(b1 - 1, b1, b1 + 2).distinct if b >= 4;
         p <- Seq(2, 4, 6, 8) if p <= b) {
      val cap = Similarity.srpProbeCapture(b, 0.9)(p)
      val c = Similarity.srpDirectedCatchProb(b, 0.9, cap)
      val t = math.max(1, math.ceil(math.log(0.05) / math.log(1.0 - c)).toInt)
      if (t <= 64) run(s"b=$b p=$p solved-t", b, t, p)
    }
    spark.stop()
  }
}
