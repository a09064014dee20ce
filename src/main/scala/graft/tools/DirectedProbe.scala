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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("directedprobe", Sessions.cpusFromEnv(32))
    val corpus = DataOpsQueries.twinCorpus(Tables.load(spark, dir, "embeddings"))
    val n = corpus.count()
    println(s"[probe] corpus n=$n")
    val exact = Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .count()
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
    // hand grid around the directed optimum: probe-count sweep at the
    // r7 planes, and a mid-tables point
    for (p <- Seq(0, 1, 2, 3, 4)) {
      val cap = Similarity.srpProbeCapture(b0, 0.9)(p)
      val c = Similarity.srpDirectedCatchProb(b0, 0.9, cap)
      val t = math.max(1, math.ceil(math.log(0.05) / math.log(1.0 - c)).toInt)
      if (t <= 64) run(s"b=$b0 p=$p solved-t", b0, t, p)
    }
    spark.stop()
  }
}
