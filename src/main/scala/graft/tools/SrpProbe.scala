package graft.tools

import graft.{Sessions, Tables}
import graft.ops.{Dedup, Similarity, VectorOps}
import org.apache.spark.sql.functions._

/** Scratch probe: SRP native/composable parity + srpNearDupPairs recall
  * and timing at both gate SFs, for parameter selection.
  */
object SrpProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("srp-probe", 32)
    // warm-up: codegen + JIT outside timings
    Similarity.srpNearDupPairs(
      Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
      "vec_id", "embedding", 0.4, planes = 4, tables = 12).count()
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.load(spark, sf, "embeddings")
      val v = e.withColumn("dv", VectorOps.toDoubleVec(col("embedding")))
      val mismatch = v.select(
        (0 until 4).map(t =>
          (VectorOps.srpBucket(col("dv"), 8, t * 8) =!=
            VectorOps.srpBucketComposable(col("dv"), 8, t * 8)).as(s"m$t")): _*)
        .filter((0 until 4).map(t => col(s"m$t")).reduce(_ || _)).count()
      println(s"[$sf] parity mismatches: $mismatch")

      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      var t0 = System.nanoTime()
      val exact = pairs(Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.4))
      val tExact = (System.nanoTime() - t0) / 1e9
      for ((p, t) <- Seq((4, 12), (4, 8), (6, 12), (8, 16))) {
        t0 = System.nanoTime()
        val lsh = pairs(Similarity.srpNearDupPairs(e, "vec_id", "embedding", 0.4,
          planes = p, tables = t))
        val dt = (System.nanoTime() - t0) / 1e9
        val nCand = Similarity.srpCandidatePairs(e, "vec_id", "embedding", p, t).count()
        println(f"[$sf] planes=$p tables=$t recall=${(lsh & exact).size}/${exact.size}" +
          f" subset=${lsh.subsetOf(exact)} cand=$nCand time=$dt%.2fs (exact $tExact%.2fs)")
      }
    }
    spark.stop()
  }
}
