package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.functions._

object Q137Decomp {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("q137decomp", graft.Sessions.cpusFromEnv(32))
    val d = s.read.parquet(args.headOption.getOrElse(
      "/tmp/graft_scale4749707668783115151") + "/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[q137d] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    d.count(); d.count() // warm
    time("scan only")(d.count())
    time("lower only")(d.select(lower(col("text")).as("x")).filter(length(col("x")) > 0).count())
    time("norm projection")(d.select(Dedup.normalizeText(col("text")).as("x"))
      .filter(length(col("x")) > 0).count())
    time("norm hash groupBy")(d.select(col("doc_id"),
        xxhash64(Dedup.normalizeText(col("text"))).as("h"))
      .groupBy("h").agg(min("doc_id")).count())
    time("full q137")(Dedup.normalizedDedup(d, "doc_id", "text").count())
    s.stop()
  }
}
