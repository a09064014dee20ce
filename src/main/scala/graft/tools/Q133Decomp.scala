package graft.tools

import graft.ops.ManifestV2
import org.apache.spark.sql.functions._

/** Stage decomposition of q133 (the full manifest-v2 chain) at sf0.1 —
  * backs the SCALE.md note on where its headline seconds go. Each stage
  * is timed as its own action over a fresh lineage, so the numbers are
  * per-stage costs, not deltas of cumulative runs.
  */
object Q133Decomp {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("q133decomp", graft.Sessions.cpusFromEnv(32))
    val d = graft.Tables.load(s, "/root/testdata/sf0.1", "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[q133] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    d.count() // warm the scan
    time("gopher survivors (scan+filter)") {
      ManifestV2.gopherSurvivors(d).count()
    }
    val surv = ManifestV2.gopherSurvivors(d)
    time("classifier gate (train+score)") {
      ManifestV2.classifierGate(d, surv, pThreshold = 0.5).count()
    }
    val gated = ManifestV2.classifierGate(d, surv, pThreshold = 0.5)
      .localCheckpoint(true)
    time("selectAndShard over gated") {
      ManifestV2.selectAndShard(gated).count()
    }
    time("full chain (q133 relation)") {
      ManifestV2.full(d, pThreshold = 0.5).count()
    }
    s.stop()
  }
}
