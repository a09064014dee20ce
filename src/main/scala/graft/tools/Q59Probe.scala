package graft.tools

import graft.{Sessions, Tables}
import graft.ops.Similarity
import graft.analytics.DataOpsQueries
import org.apache.spark.sql.functions._

/** Scratch probe for the round-5 q59 drift (4.05 s -> 5.16 s with no
  * change to Similarity.scala): candidate-pair volume and per-stage
  * split (candidates vs dim-D verify) at sf0.1, repeated runs, so
  * variance and real regression are distinguishable.
  */
object Q59Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("q59-probe", Sessions.cpusFromEnv(32))
    val e = Tables.load(spark, dir, "embeddings")
    e.count() // warm page cache + codegen outside timings

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val ts = runs.map(_._1)
      println(f"[q59probe] $label%-24s n=${runs.head._2}%9d  " +
        f"min=${ts.min}%6.2fs  med=${ts.sorted.apply(1)}%6.2fs  max=${ts.max}%6.2fs")
    }

    time("candidates 5x12")(
      Similarity.srpCandidatePairs(e, "vec_id", "embedding", 5, 12).count())
    time("full q59 (cand+verify)")(
      Similarity.srpNearDupPairs(e, "vec_id", "embedding", 0.4,
        planes = 5, tables = 12).count())
    time("q61 prod regime")(
      Similarity.srpNearDupPairs(DataOpsQueries.twinCorpus(e), "vec_id", "embedding", 0.9)
        .count())
    // r5 drift check on the /tmp write+read roundtrips (q53/q54):
    // repeated runs separate filesystem variance from regression.
    time("q53 json roundtrip")(
      graft.SparkEntry.queries("q53_json_roundtrip")(spark, dir).count())
    time("q54 csv roundtrip")(
      graft.SparkEntry.queries("q54_csv_roundtrip")(spark, dir).count())
    spark.stop()
  }
}
