object QCheckOne {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("qcheckone", 8)
    val name = args(0)
    graft.SparkEntry.queries(name)(s, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite").parquet(s"/tmp/qcheck_$name")
    s.stop()
  }
}
