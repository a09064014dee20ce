package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("psiReport: identical snapshots contribute 0; planted shift and one-sided buckets exact") {
    val old = (Seq.fill(6)(10.0) ++ Seq.fill(2)(110.0)).toDF("v")
    val neu = (Seq.fill(2)(10.0) ++ Seq.fill(2)(110.0) ++ Seq.fill(4)(210.0))
      .toDF("v")
    val same = Drift.psiReport(old, old, "v", binWidth = 100.0)
      .collect().map(r => (r.getLong(0), r.getDouble(5)))
    assert(same.toSeq.sortBy(_._1) === Seq((0L, 0.0), (1L, 0.0)))
    val rep = Drift.psiReport(old, neu, "v", binWidth = 100.0)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // bucket 0: p=0.75 q=0.25 → 0.5·ln 3; bucket 1: 0.25 vs 0.25 → 0;
    // bucket 2: old absent → p floored at 1e-6, q=0.5
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rep(0L) === ((6L, 2L, 0.75, 0.25, r6(0.5 * math.log(3.0)))))
    assert(rep(1L) === ((2L, 2L, 0.25, 0.25, 0.0)))
    val (n2o, n2n, p2o, p2n, c2) = rep(2L)
    assert((n2o, n2n, p2o, p2n) === ((0L, 4L, 1e-6, 0.5)))
    assert(c2 === r6((1e-6 - 0.5) * math.log(1e-6 / 0.5)))
    assert(c2 > 6.0) // the one-sided bucket dominates, large but finite
  }

  test("streamed monitor ≡ batch psiReport over the raw snapshots; redelivered batch is a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-drift")
    val (src, mon, ckpt) = (s"$root/src", s"$root/mon", s"$root/ckpt")
    val old = (1 to 60).map(i => (i * 7 % 500).toDouble).toDF("v")
    val neu = (1 to 80).map(i => (i * 13 % 700).toDouble).toDF("v")
    Drift.psiWriteRef(old, "v", binWidth = 100.0, mon)
    neu.repartition(3).write.parquet(src)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("v", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val q = graft.streaming.DriftStream.monitorSink(stream, "v", mon)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toSeq
    val monitored = rows(Drift.psiFromStats(spark, mon))
    assert(monitored === rows(Drift.psiReport(old, neu, "v", binWidth = 100.0)))
    assert(monitored.nonEmpty)
    // redelivery: same (stream, batch) id appends nothing
    val b = neu.limit(10)
    assert(graft.streaming.DriftStream.appendBatch(b, 0L, "v", mon, streamId = "s1"))
    val after = rows(Drift.psiFromStats(spark, mon))
    assert(!graft.streaming.DriftStream.appendBatch(b, 0L, "v", mon, streamId = "s1"))
    assert(rows(Drift.psiFromStats(spark, mon)) === after)
  }

  test("psiReport rejects non-positive bin width and out-of-range eps") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Drift.psiReport(df, df, "v", binWidth = 0.0)
    }
    intercept[IllegalArgumentException] {
      Drift.psiReport(df, df, "v", binWidth = 1.0, eps = 2.0)
    }
  }

  test("embeddingDrift: identical slices 1.0, orthogonal 0.0, flipped -1.0, zero-norm NULL, one-sided groups drop") {
    import org.apache.spark.sql.functions._
    def df(rows: Seq[(String, Array[Float])]) = rows.toDF("g", "embedding")
    val base = df(Seq(
      ("same", Array(1f, 2f, 0f)), ("same", Array(3f, 2f, 0f)),
      ("orth", Array(2f, 0f, 0f)),
      ("flip", Array(0f, 4f, 0f)),
      ("zero", Array(0f, 0f, 0f)),
      ("only_base", Array(1f, 1f, 1f))))
    val cur = df(Seq(
      ("same", Array(1f, 2f, 0f)), ("same", Array(3f, 2f, 0f)),
      ("orth", Array(0f, 0f, 5f)),
      ("flip", Array(0f, -6f, 0f)),
      ("zero", Array(1f, 1f, 0f))))
    val got = Drift.embeddingDrift(base, cur, "g", "embedding")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got.keySet === Set("same", "orth", "flip", "zero"))
    assert(got("same") === ((2L, 2L, 1.0)))
    assert(got("orth")._3 === 0.0)
    assert(got("flip")._3 === -1.0)
    assert(got("zero")._3.isNaN) // zero-norm base centroid -> NULL
    // corpus: the synthetic embeddings are near-uniform on the sphere
    // (no cluster structure — SCALE.md's ANN note), so each label's
    // centroid is a noise residual and even/odd cosines hover near 0:
    // assert the range contract, and that the SAME slice against
    // itself reads exactly 1.0 (the stable-release fixed point).
    val e = graft.Tables.load(spark, graft.TestSpark.Sf001, "embeddings")
      .select("label", "vec_id", "embedding")
    val even = e.filter(col("vec_id") % 2 === 0).drop("vec_id")
    val corpus = Drift.embeddingDrift(even,
      e.filter(col("vec_id") % 2 =!= 0).drop("vec_id"),
      "label", "embedding")
      .collect().map(r => r.getDouble(3))
    assert(corpus.nonEmpty && corpus.forall(c => c >= -1.0 && c <= 1.0))
    val self = Drift.embeddingDrift(even, even, "label", "embedding")
      .collect().map(r => r.getDouble(3))
    assert(self.nonEmpty && self.forall(_ === 1.0))
  }
}
