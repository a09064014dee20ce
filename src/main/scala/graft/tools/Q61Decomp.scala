package graft.tools

import graft._
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Scratch probe: where q61's 64x wall time goes — candidate join vs
  * exact-cosine verify — so the next optimization targets the real
  * dominant stage.
  */
object Q61Decomp {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("q61decomp", Sessions.cpusFromEnv(32))
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
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    val corpus = analytics.DataOpsQueries.twinCorpus(
      spark.read.parquet(s"$out/embeddings.parquet"))
    val n = corpus.count()
    val (b, t, p) = Similarity.srpParamsDirectedFor(n, 0.9)
    println(s"[q61d] n=$n solved=($b,$t,p=$p)")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[q61d] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c")
    }
    def cand() = Similarity.srpCandidatePairs(
      corpus, "vec_id", "embedding", b, t, probePlanes = p)
    def full() = Similarity.srpNearDupPairs(
      corpus, "vec_id", "embedding", 0.9, b, t, probePlanes = p)
    time("candidates warm")(cand().count())
    time("candidates")(cand().count())
    time("full warm")(full().count())
    time("full")(full().count())
    spark.stop()
  }
}
