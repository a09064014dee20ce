package graft.tools

import org.apache.spark.sql.functions._

/** Iteration-scaling probe behind the [[graft.ops.Iterate]] fix: runs
  * Bradley–Terry at increasing iteration counts and prints wall time
  * per fit. Before the fix (bare `localCheckpoint(true)` per step,
  * whose LogicalRDD inherits the child plan's statistics), the
  * 3-item/30-iteration fixture measured: 10 iters 10.7 s, 20 iters
  * 12.1 s, 24 iters **325.7 s** — the planner burning CPU in
  * `BigInteger.multiplyToomCook3` multiplying stats whose bit count
  * quadrupled per iteration. After (Iterate.cut resets the leaf
  * stats): 10 iters 11.8 s, 24 iters 6.8 s, 30 iters 8.5 s — flat.
  */
object BtProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("btprobe", 4)
    import spark.implicits._
    val comps = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("a", "a"))
      .toDF("winner", "loser")
    for (it <- Seq(10, 16, 20, 24, 28, 30)) {
      val t0 = System.nanoTime
      graft.ops.Classifier.bradleyTerry(comps, "winner", "loser", iters = it).collect()
      println(f"ITERS=$it SEC=${(System.nanoTime - t0) / 1e9}%.1f")
    }
    spark.stop(); sys.exit(0)
  }
}
