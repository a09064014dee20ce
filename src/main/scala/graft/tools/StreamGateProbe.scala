package graft.tools

/** Wall-clock probe for the streaming gate entries (they are excluded
  * from ScaleProbe and from the bench headline; this is the local
  * feedback loop for their fixture cost — run with
  * `runMain graft.tools.StreamGateProbe q229_stream_frame_index`).
  */
object StreamGateProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q229_stream_frame_index")
    val spark = graft.Sessions.local("streamgateprobe", graft.Sessions.cpusFromEnv(32))
    for (n <- names) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      println(f"[sgate] $n rows=$c t=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
