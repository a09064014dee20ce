package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
  lazy val query: Seq[Double] = embs.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("brute-force top-k: query vector itself ranks first with cosine 1.0") {
    val top = VectorOps.bruteForceTopK(embs, "vec_id", "embedding", query, 5).collect()
    assert(top.head.getLong(0) === 0L)
    assert(top.head.getDouble(1) === 1.0)
    // descending similarity
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims === sims.sorted.reverse)
  }

  test("SRP-LSH ANN: finds the query itself and recalls a sane fraction of true top-k") {
    val exact = VectorOps.bruteForceTopK(embs, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = VectorOps.srpTopK(embs, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L), "bucket of the query must contain the query")
    val recall = (exact & approx).size / 20.0
    assert(recall >= 0.25, s"recall@20 = $recall — buckets degenerated")
  }

  test("IVF ANN: finds the query itself and recalls a sane fraction of true top-k") {
    val exact = VectorOps.bruteForceTopK(embs, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = VectorOps.ivfTopK(embs, "vec_id", "embedding", query, 20)
      .collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L), "probed lists must contain the query's own list")
    val recall = (exact & approx).size / 20.0
    assert(recall >= 0.25, s"recall@20 = $recall — probe lists degenerated")
  }

  test("approx_count_distinct stays within its error bound of exact") {
    val events = graft.Tables.load(spark, TestSpark.Sf001, "events")
    val rows = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"),
        approx_count_distinct("user_id").as("approx"))
      .collect()
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.1, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("int8 quantization: cosine drift bounded, zero vector safe") {
    import org.apache.spark.sql.functions._
    val q = embs
      .withColumn("dv", VectorOps.toDoubleVec(col("embedding")))
      .withColumn("qz", VectorOps.quantizeInt8(col("embedding")))
      .withColumn("dq", VectorOps.dequantize(col("qz")))
      .select(VectorOps.cosine(col("dv"), col("dq")).as("self_cos"))
      .agg(min("self_cos")).head().getDouble(0)
    // reconstructed vector stays nearly collinear with the original
    assert(q > 0.999, s"min self-cosine after int8 round-trip = $q")
    import spark.implicits._
    val zero = Seq(Tuple1(Array(0f, 0f))).toDF("embedding")
      .select(VectorOps.dequantize(VectorOps.quantizeInt8(col("embedding"))).as("v"))
      .head().getSeq[Double](0)
    assert(zero === Seq(0.0, 0.0))
  }

  test("cosine is symmetric and bounded on real vectors") {
    val two = embs.filter(col("vec_id") < 2)
      .select(VectorOps.toDoubleVec(col("embedding")).as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    import spark.implicits._
    val df = Seq((two(0), two(1)), (two(1), two(0))).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(df(0).getDouble(0) - df(1).getDouble(0)) < 1e-12)
    assert(df.forall(r => math.abs(r.getDouble(0)) <= 1.0 + 1e-12))
  }
}
