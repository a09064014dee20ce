package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Stage decomposition for q122's 64× ratio (10.58 at the round-11
  * sweep vs q119's 6.17 on the same machinery): times q119's weight
  * relation, q122 as registered, and q122 with the weight relation
  * staged through localCheckpoint — isolating whether the extra cost
  * is the Gumbel TakeOrdered itself or a recomputation of the weight
  * pipeline under the changed plan shape.
  *
  * usage: runMain graft.tools.Q122Decomp <1xDir> <kxDir>
  */
object Q122Decomp {
  def main(args: Array[String]): Unit = {
    val dirs = Seq(args(0), args(1))
    val spark = Sessions.local("q122decomp", Sessions.cpusFromEnv(32))
    def docs(d: String) = Tables.load(spark, d, "documents")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (d <- dirs; rep <- 0 until 2) {
      val w119 = time(graft.ops.TextAnalysis.dsirWeights(
        docs(d), "doc_id", "text", col("doc_id") % 7 === 0, 512).count())
      val q122 = time(graft.ops.TextAnalysis.dsirResample(
        docs(d), "doc_id", "text", col("doc_id") % 7 === 0,
        n = 100, vocabSize = 512, seed = 7L).count())
      val staged = time {
        val w = graft.ops.TextAnalysis.dsirWeights(
          docs(d), "doc_id", "text", col("doc_id") % 7 === 0, 512)
          .localCheckpoint()
        val m = 1L << 31
        val r1 = pmod(col("doc_id") * lit(2654435761L) + lit(7L), lit(m))
        val r2 = pmod(r1 * r1 + lit(7L), lit(m))
        val u = (r2.cast("double") + lit(0.5)) / lit(m.toDouble)
        val n = w.select(col("doc_id"), col("dsir_w"),
            round(col("dsir_w") - log(-log(u)), 4).as("gkey"))
          .orderBy(col("gkey").desc, col("doc_id")).limit(100).count()
        w.unpersist()
        n
      }
      println(f"[q122decomp] dir=$d rep=$rep w119=$w119%6.2fs q122=$q122%6.2fs staged=$staged%6.2fs")
    }
    spark.stop()
  }
}
