object NoOracle {
  def main(args: Array[String]): Unit = {
    val no = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    no.toSeq.sorted.foreach(println)
  }
}
