package graft.streaming

import graft.{Tables, TestSpark}
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH near-dup (q121) against its batch twin
  * [[Dedup.minhashEstPairs]]: same signatures, same estimator, same
  * rounding — the DISTINCT emitted pair set must equal the batch
  * relation under any micro-batch arrival order, redelivery must be a
  * no-op, and bucket saturation must latch.
  */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus: Seq[(Long, String)] =
    Tables.load(spark, TestSpark.Sf001, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Run the stream over `batches`, one micro-batch per element. */
  private def runStream(
      batches: Seq[Seq[(Long, String)]],
      name: String,
      maxBucket: Int = 1000): Set[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = DedupStream.nearDupPairs(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        maxBucket = maxBucket)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b =>
        in.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def batchPairs(rows: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
    import spark.implicits._
    Dedup.minhashEstPairs(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("stream ≡ batch twin (distinct pair sets) across micro-batch splits") {
    val docs = corpus
    val want = batchPairs(docs)
    assert(want.nonEmpty, "sf0.001 corpus should contain near-dups")
    // three different arrival orders / batch shapes
    val splits = Seq(
      Seq(docs),                                   // single batch
      docs.grouped(120).toSeq,                     // several batches, id order
      docs.reverse.grouped(97).toSeq)              // reversed arrival
    for ((s, i) <- splits.zipWithIndex) {
      val got = runStream(s, s"neardup_eq_$i")
      assert(got === want, s"split $i: ${got.size} vs ${want.size} pairs")
    }
  }

  test("redelivered batches are a no-op and nothing ever self-pairs") {
    val docs = corpus
    val want = batchPairs(docs)
    val batches = docs.grouped(150).toSeq
    // redeliver every batch immediately, then the whole corpus again
    val redelivered = batches.flatMap(b => Seq(b, b)) :+ docs
    val got = runStream(redelivered, "neardup_redeliver")
    assert(got === want)
    assert(got.forall { case (a, b, _) => a < b }, "ordered, never self-paired")
  }

  test("bucket saturation latches at maxBucket: later arrivals neither emit nor store") {
    // 6 identical docs, bands share one bucket; cap 3. Batch 1 brings
    // ids 1–3 (3 pairs), the bucket saturates, batch 2's ids 4–6 drop.
    val same = (i: Long) => (i, "the exact same text in every document here")
    val got = runStream(
      Seq(Seq(1L, 2L, 3L).map(same), Seq(4L, 5L, 6L).map(same)),
      "neardup_saturate", maxBucket = 3)
    assert(got === Set((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0)))
  }

  test("estimator values match the batch relation exactly (rounding included)") {
    val docs = corpus
    val got = runStream(Seq(docs), "neardup_est")
    val want = batchPairs(docs)
    val gotByPair = got.groupBy(p => (p._1, p._2))
    // same pairs AND same per-pair estimates — Set equality already
    // implies it; this pins that no pair appears with TWO estimates
    assert(gotByPair.forall(_._2.size == 1))
  }
}
