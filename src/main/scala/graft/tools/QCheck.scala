package graft.tools

import graft._

/** Single-query replica of [[graft.Verify]] for fast iteration:
  * `runMain graft.tools.QCheck <sfDir> <outDir> q82_span_dedup [more...]`
  * writes only the named queries' parquet + a subset oracle_sql.json, so
  * `scripts/check_correctness.py <outDir> <sfDir>` gates just those.
  */
object QCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QCheck <sfDir> <outDir> <query...>")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = Sessions.local("qcheck", Sessions.cpusFromEnv(8))
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[qcheck] wrote $n")
    }
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (n, sql) => s"${JsonStr(n)}: ${JsonStr(sql)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
