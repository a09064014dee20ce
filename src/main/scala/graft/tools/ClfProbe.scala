package graft.tools

import graft.ops.{Classifier, TextAnalysis}
import org.apache.spark.sql.functions._

object ClfProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("clfprobe", 8)
    val d = graft.Tables.load(s, "/root/testdata/sf0.01", "documents")
    val labels = d.select(col("doc_id"),
      when(TextAnalysis.qualityScoreCol(col("text")) >= 0.65, 1.0).otherwise(0.0).as("y"))
    val feats = Classifier.hashedFeatures(d, "doc_id", "text", 1 << 15).cache()
    val isTrain = col("doc_id") % 5 =!= 0
    for (lr <- Seq(1.0, 2.0); it <- Seq(32, 96)) {
      val w = Classifier.trainLogReg(feats.filter(isTrain), labels.filter(isTrain), "doc_id", it, lr)
      val trainLoss = Classifier.logLoss(feats.filter(isTrain), labels.filter(isTrain), w, "doc_id")
      val ho = Classifier.scoreLogReg(feats.filter(!isTrain), w, "doc_id")
        .join(labels, Seq("doc_id"))
      val acc = ho.select(when((col("p") >= 0.5) === (col("y") === 1.0), 1).otherwise(0).as("ok"))
        .agg(avg("ok")).head().getDouble(0)
      val spread = ho.select(min("p"), max("p")).head()
      println(f"CLF lr=$lr%5.1f iters=$it loss=$trainLoss%.4f acc=$acc%.3f p=[${spread.getDouble(0)}%.3f,${spread.getDouble(1)}%.3f]")
    }
    s.stop()
  }
}
