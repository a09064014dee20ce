package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.Sf001, "documents")

  test("clean(): survivors are a subset, near-dups are pruned, annotations ride along") {
    val cfg = CorpusPipeline.Config()
    val cleaned = CorpusPipeline.clean(docs, cfg)
    val survivors = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(all))
    assert(survivors.nonEmpty)
    // every near-dup pair in the survivor set would contradict the prune
    val pairs = Dedup.minhashLshPairs(
        cleaned, "doc_id", "text", threshold = cfg.nearDupThreshold)
      .collect()
    assert(pairs.isEmpty, s"near-dup pairs survived: ${pairs.mkString(",")}")
    assert(cleaned.columns.contains("quality_score"))
    assert(cleaned.columns.contains("predicted_lang"))
  }

  test("exactDedup ≡ groupBy(text) keep-min-id, schema unchanged, NULL text is one group") {
    val withNulls = docs.select($"doc_id", $"text", $"source")
      .unionAll(Seq((900001L, Option.empty[String], Option("s")),
        (900002L, Option.empty[String], Option("s"))).toDF("doc_id", "text", "source"))
    val out = CorpusPipeline.exactDedup(withNulls)
    assert(out.columns.toSeq === withNulls.columns.toSeq)
    val expected = withNulls
      .join(withNulls.groupBy("text").agg(min($"doc_id").as("doc_id")).select("doc_id"),
        "doc_id", "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.contains(900001L) && !got.contains(900002L))
  }

  test("quality gate actually gates") {
    val strict = CorpusPipeline.Config(minQuality = 0.99)
    assert(CorpusPipeline.qualityFilter(
      CorpusPipeline.annotate(docs), strict).count() <
      CorpusPipeline.annotate(docs).count())
  }

  test("stats is deterministic and covers all predicted languages of the survivors") {
    val a = CorpusPipeline.stats(docs).collect().map(_.toSeq)
    val b = CorpusPipeline.stats(docs).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(r => r(1).asInstanceOf[Long] > 0))
  }
}
