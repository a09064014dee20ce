package graft.tools

import graft.{Sessions, SparkEntry}

/** Round-16 scratch probe: run the new q230–q232 entries standalone
  * against a testdata dir (arg 1, default sf0.001) and print row
  * counts + a result sample — the pre-spec smoke pass.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q230_corpus_upsert", "q231_bm25_phrase", "q232_bm25_proximity")
    val spark = Sessions.local("r16probe", sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", "8").toInt)
    val outDir = "/tmp/r16verify"
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      df.write.mode("overwrite").parquet(s"$outDir/$n")
      val rows = spark.read.parquet(s"$outDir/$n").count()
      println(f"R16PROBE $n rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val sub = SparkEntry.oracleSql.view.filterKeys(names.contains).toMap
    val json = sub.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\")
        .replace("\"", "\\\"").replace("\n", "\\n") + "\""
    }.mkString("{", ",\n", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
