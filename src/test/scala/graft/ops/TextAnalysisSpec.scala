package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish on a known string") {
    val df = Seq((1L, "hello world x1 !!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, "doc_id", "text").head()
    assert(r.getLong(1) === 4L) // ws tokens
    // bpe-ish: hello, world, x, 1, !, ! → 6
    assert(r.getLong(2) === 6L)
    assert(r.getLong(3) === 17L)
  }

  test("quality score stays in [0,1] over the corpus and rewards stopwords") {
    val docs = graft.Tables.load(spark, TestSpark.Sf001, "documents")
    val q = TextAnalysis.qualityMetrics(docs, "doc_id", "text")
    val scores = q.select("quality_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    val hi = TextAnalysis.qualityMetrics(
      Seq((1L, "the cat of the house and a dog to go in peace " * 3)).toDF("doc_id", "text"),
      "doc_id", "text").head().getAs[Double]("quality_score")
    val lo = TextAnalysis.qualityMetrics(
      Seq((1L, "@#$ %^&")).toDF("doc_id", "text"),
      "doc_id", "text").head().getAs[Double]("quality_score")
    assert(hi > lo)
  }

  test("language-id is deterministic and emits only known labels") {
    val docs = graft.Tables.load(spark, TestSpark.Sf001, "documents")
    val labels = LanguageId(docs, "text").select("predicted_lang")
      .distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(LanguageId.profiles.map(_._1).toSet))
    val a = LanguageId(docs, "text").select("doc_id", "predicted_lang").collect().toSeq
    val b = LanguageId(docs, "text").select("doc_id", "predicted_lang").collect().toSeq
    assert(a === b)
  }

  test("rolling fingerprint is order-sensitive; content hash is not length-based") {
    val df = Seq((1L, "aa b ccc"), (2L, "ccc b aa"), (3L, "aa b ccc"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(3L)) // same text, same fp
    assert(fps(1L) !== fps(2L)) // permuted token lengths → different fp
  }

  test("multimodal: feature extraction is deterministic and batch-shaped") {
    val docs = graft.Tables.load(spark, TestSpark.Sf001, "documents").limit(50)
    val f1 = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 4))
  }
}
