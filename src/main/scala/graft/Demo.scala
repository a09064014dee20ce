package graft

import graft.ops._

/** Dev smoke entry: drives the library paths that don't surface through
  * Verify's SQL-comparable queries (typed mapPartitions multimodal
  * pipeline, ANN recall). `sbt "runMain graft.Demo [sfDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local("graft-demo", Sessions.cpusFromEnv())
    val docs = Tables.load(spark, dir, "documents")

    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(media)
    println(s"[demo] multimodal features rows=${feats.count()}")
    feats.show(3, truncate = false)
    println(s"[demo] empty-input features rows=" +
      s"${Multimodal.extractFeatures(Multimodal.fromDocuments(docs.limit(0))).count()}")

    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val exact = VectorOps.bruteForceTopK(embs, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = VectorOps.srpTopK(embs, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    println(s"[demo] ann recall@20 = ${(exact & approx).size}/20")
    spark.stop()
  }
}
