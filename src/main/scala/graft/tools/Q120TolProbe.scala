package graft.tools

import graft.ops.{Classifier, TextAnalysis}
import org.apache.spark.sql.functions._

/** Scratch probe: q120's training recipe under the round-12 cost
  * levers (tol early stop, hashSample mini-batches) at sf0.1 — how
  * many steps actually run, at what wall cost, and does the holdout
  * hold. Backs the SCALE.md round-12 classifier note and the q120
  * registration choice.
  */
object Q120TolProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("q120tol", graft.Sessions.cpusFromEnv(32))
    val d = graft.Tables.load(s, "/root/testdata/sf0.1", "documents")
    val labels = d.select(col("doc_id"),
      when(TextAnalysis.qualityScoreCol(col("text")) >= 0.65, 1.0)
        .otherwise(0.0).as("y"))
    val feats = Classifier.hashedFeatures(d, "doc_id", "text", 1 << 15).cache()
    feats.count()
    val isTrain = col("doc_id") % 5 =!= 0
    val fT = feats.filter(isTrain)
    val lT = labels.filter(isTrain)
    for ((tol, frac) <- Seq((0.0, 1.0), (1e-3, 1.0), (1e-2, 1.0),
        (0.0, 0.5), (1e-3, 0.5))) {
      val t0 = System.nanoTime()
      val res = Classifier.trainLogRegStats(fT, lT, "doc_id",
        iters = 16, lr = 2.0, tol = tol, sampleFrac = frac)
      res.weights.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val acc = Classifier.scoreLogReg(feats.filter(!isTrain), res.weights, "doc_id")
        .join(labels, Seq("doc_id"))
        .select(when((col("p") >= 0.5) === (col("y") === 1.0), 1)
          .otherwise(0).as("ok"))
        .agg(avg("ok")).head().getDouble(0)
      println(f"Q120TOL tol=$tol%7.0e frac=$frac%.1f steps=${res.stepsApplied}%2d " +
        f"loss=${res.lastLoss}%.4f time=$secs%6.2fs acc=$acc%.3f")
    }
    s.stop()
  }
}
