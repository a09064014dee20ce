package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Stage decomposition of q107 (PQ train / encode / ADC scan) at 1× and
  * a replicated k× — attributes the probe ratio to its stages the same
  * way Q101Time/Q59Probe do for their families.
  */
object PqDecomp {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(64)
    val spark = Sessions.local("pq-decomp", Sessions.cpusFromEnv(32))
    val dir = "/root/testdata/sf0.1"
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqdecomp").toString
    val emb = Tables.load(spark, dir, "embeddings")
    val maxVid = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until k).map { i =>
      val e = emb.withColumn("vec_id", col("vec_id") + lit(i * maxVid))
      if (i == 0) e
      else e.withColumn("embedding",
        transform(col("embedding"), (x, d) =>
          when(pmod(xxhash64(lit(i), d), lit(2)) === 0, x).otherwise(-x)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    def t(label: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[pq] $label%-22s $s%6.2f s"); s
    }
    for ((label, d) <- Seq("1x" -> dir, s"${k}x" -> tmp)) {
      val e = Tables.load(spark, d, "embeddings")
      e.count() // warm scan
      val model = graft.ops.Pq.pqTrain(e, "embedding", 8, 16) // warm train
      t(s"$label train")(graft.ops.Pq.pqTrain(e, "embedding", 8, 16))
      val enc = graft.ops.Pq.pqEncode(e, "vec_id", "embedding", model)
      // force the codes column (a bare count() would let Catalyst prune
      // the encode away and time an empty projection)
      def forceEncode() = enc.agg(sum(element_at(col("codes"), 1))).head()
      forceEncode() // warm encode
      t(s"$label encode")(forceEncode())
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toSeq
      val top = graft.ops.Pq.pqTopK(enc, model, "vec_id", q, 20)
      top.collect() // warm
      t(s"$label adc-topk")(top.collect())
    }
    spark.stop()
  }
}
