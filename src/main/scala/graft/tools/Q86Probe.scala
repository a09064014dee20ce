package graft.tools
object Q86Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("q86-probe", graft.Sessions.cpusFromEnv(32))
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("q01_scan_topk")(spark, dir).count() // warm
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q86_seeded_shuffle")(spark, dir).count()
      println(f"[q86] run$i ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
