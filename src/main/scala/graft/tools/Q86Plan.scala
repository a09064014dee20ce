package graft.tools
object Q86Plan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("q86-plan", 8)
    val df = graft.SparkEntry.queries("q86_seeded_shuffle")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE=" + plan.contains("ReusedExchange"))
    df.count()
    println("AQE_FINAL:")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
