package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Positional postings + phrase/proximity probes over the persisted
  * BM25 index ([[LexIndex]]): hand-computable fixtures pin the exact
  * anchor arithmetic, an independent join-based recompute pins the
  * corpus-scale relation, and the maintenance lifecycle (append,
  * delete, purge) carries position arrays bit-identically.
  */
class LexPositionalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-pos-$tag").toString

  private lazy val fixture: DataFrame = Seq(
    (1L, "a b c a b c a b"),
    (2L, "x a b y"),
    (3L, "a c b"),
    (4L, "b b a"),
    (5L, "q r s")).toDF("doc_id", "text")

  private lazy val fixtureIdx: String = {
    val p = tmp("fix")
    LexIndex.bm25WriteIndex(fixture, "doc_id", "text", p, buckets = 4,
      positional = true)
    p
  }

  private def phrase(path: String, terms: String*): Seq[(Long, Long)] =
    LexIndex.bm25PhraseProbe(spark, path, "doc_id", terms)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))

  private def prox(path: String, w: Int, terms: String*): Seq[(Long, Long)] =
    LexIndex.bm25ProximityProbe(spark, path, "doc_id", terms, w)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))

  test("phrase: anchored adjacency counts occurrences exactly") {
    assert(phrase(fixtureIdx, "a", "b") === Seq(1L -> 3L, 2L -> 1L))
    assert(phrase(fixtureIdx, "a", "b", "c") === Seq(1L -> 2L))
    // order matters: "b a" appears only in doc 4 ("b b a"); doc 1's
    // every 'b' is followed by 'c' or end-of-doc
    assert(phrase(fixtureIdx, "b", "a") === Seq(4L -> 1L))
    // both terms present but never adjacent → no row (doc 3 "a c b")
    assert(phrase(fixtureIdx, "c", "a") === Seq(1L -> 2L))
    assert(phrase(fixtureIdx, "x", "c").isEmpty)
  }

  test("proximity: exact minimal window span") {
    assert(prox(fixtureIdx, 3, "a", "b") ===
      Seq(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L))
    assert(prox(fixtureIdx, 2, "a", "b") ===
      Seq(1L -> 2L, 2L -> 2L, 4L -> 2L))
  }

  test("corpus-scale phrase ≡ an independent position-join recompute") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
      .select($"doc_id", $"text")
    val idx = tmp("corpus")
    LexIndex.bm25WriteIndex(docs, "doc_id", "text", idx, buckets = 16,
      positional = true)
    val pos = docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p", "w")))
    def at(t: String, off: Int) = pos.filter($"w" === t)
      .select($"doc_id", ($"p" - off).as("anchor"))
    val want = at("vector", 0).join(at("scan", 1), Seq("doc_id", "anchor"))
      .groupBy("doc_id").agg(count(lit(1)).as("phrase_tf"))
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(phrase(idx, "vector", "scan") === want)
    assert(want.nonEmpty)
    val want3 = at("the", 0).join(at("table", 1), Seq("doc_id", "anchor"))
      .join(at("key", 2), Seq("doc_id", "anchor"))
      .groupBy("doc_id").agg(count(lit(1)).as("phrase_tf"))
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(phrase(idx, "the", "table", "key") === want3)
  }

  test("append ≡ rebuild: positional rows land under the persisted fanout") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
      .select($"doc_id", $"text")
    val (a, b) = (tmp("appA"), tmp("appB"))
    LexIndex.bm25WriteIndex(docs, "doc_id", "text", a, buckets = 8,
      positional = true)
    LexIndex.bm25WriteIndex(docs.filter($"doc_id" < 250), "doc_id",
      "text", b, buckets = 8, positional = true)
    LexIndex.bm25AppendIndex(docs.filter($"doc_id" >= 250), "doc_id",
      "text", b)
    assert(phrase(a, "vector", "scan") === phrase(b, "vector", "scan"))
    val score = (p: String) =>
      LexIndex.bm25ProbeIndex(spark, p, "doc_id", Seq("vector", "scan"))
        .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(score(a) === score(b))
  }

  test("delete + purge carry positions: probes ≡ rebuild without the ids") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
      .select($"doc_id", $"text")
    val (a, b) = (tmp("delA"), tmp("delB"))
    LexIndex.bm25WriteIndex(docs, "doc_id", "text", a, buckets = 8,
      positional = true)
    LexIndex.bm25DeleteIds(docs.filter($"doc_id" % 7 === 3), "doc_id", a)
    LexIndex.bm25WriteIndex(docs.filter($"doc_id" % 7 =!= 3), "doc_id",
      "text", b, buckets = 8, positional = true)
    assert(phrase(a, "vector", "scan") === phrase(b, "vector", "scan"))
    LexIndex.bm25PurgeIndex(spark, a, "doc_id")
    assert(!Tombstones.exists(spark, a))
    assert(phrase(a, "vector", "scan") === phrase(b, "vector", "scan"))
    assert(prox(a, 5, "vector", "window") === prox(b, 5, "vector", "window"))
    // phrase-ranked scores stay bit-identical through the purge too
    // (df and N/avgdl both tombstone-exact)
    def rank(p: String) =
      LexIndex.bm25PhraseRank(spark, p, "doc_id", Seq("vector", "scan"))
        .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(rank(a) === rank(b))
    assert(rank(a).nonEmpty)
  }

  test("compaction folds positional append litter with bit-identical probes") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
      .select($"doc_id", $"text")
    val idx = tmp("compact")
    LexIndex.bm25WriteIndex(docs.filter($"doc_id" < 100), "doc_id",
      "text", idx, buckets = 8, positional = true)
    (1 to 4).foreach(i => LexIndex.bm25AppendIndex(
      docs.filter($"doc_id" >= i * 100 && $"doc_id" < (i + 1) * 100),
      "doc_id", "text", idx))
    val beforePhrase = phrase(idx, "vector", "scan")
    val beforeProx = prox(idx, 5, "vector", "window")
    val report = LexIndex.bm25CompactIndex(spark, idx, maxFilesPerDir = 1)
    assert(report.nonEmpty)
    assert(phrase(idx, "vector", "scan") === beforePhrase)
    assert(prox(idx, 5, "vector", "window") === beforeProx)
  }

  test("refusals: non-positional index, repeated terms, infeasible window") {
    val flat = tmp("flat")
    LexIndex.bm25WriteIndex(fixture, "doc_id", "text", flat, buckets = 4)
    val e1 = intercept[IllegalArgumentException](
      phrase(flat, "a", "b"))
    assert(e1.getMessage.contains("positional"))
    val e2 = intercept[IllegalArgumentException](
      phrase(fixtureIdx, "a", "a"))
    assert(e2.getMessage.contains("repeated"))
    val e3 = intercept[IllegalArgumentException](
      prox(fixtureIdx, 1, "a", "b"))
    assert(e3.getMessage.contains("window"))
  }
}
