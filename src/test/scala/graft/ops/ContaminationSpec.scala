package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a benchmark doc quoted inside a longer training doc scores containment 1.0") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // full quote embedded in a longer doc → every bench shingle present
      (1L, "intro words then the quick brown fox jumps over the lazy dog and more trailing text"),
      // partial overlap
      (2L, "the quick brown fox stops here unrelated tail words"),
      // no overlap
      (3L, "completely different content with nothing shared at all")).toDF("doc_id", "text")
    val out = Contamination.report(corpus, bench, "doc_id", "text", shingleN = 3, topPerDoc = 3)
      .collect().sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(4))).toList
    // rank 1 = the full quote at containment 1.0 (asymmetric measure:
    // its Jaccard vs the long doc would be well under 1)
    assert(out.head === ((1L, 1.0)))
    // rank 2 = the partial overlap, strictly between 0 and 1
    assert(out(1)._1 === 2L && out(1)._2 > 0.0 && out(1)._2 < 1.0)
    // doc 3 shares nothing and never appears
    assert(!out.exists(_._1 == 3L))
  }

  test("no bench doc vanishes: zero-overlap scores 0.0, too-short scores NULL (unmeasurable)") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // real hit
      (101L, "completely absent benchmark phrasing nowhere in corpus"), // clean
      (102L, "too short")) // < shingleN tokens — unmeasurable
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix the quick brown fox jumps over the lazy dog suffix"))
      .toDF("doc_id", "text")
    val out = Contamination.report(corpus, bench, "doc_id", "text",
        shingleN = 3, topPerDoc = 1, benchIsSubset = false)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out.keySet === Set(100L, 101L, 102L)) // every bench doc reported
    assert(out(100L) === Some(1.0))
    assert(out(101L) === Some(0.0)) // verified clean — a measured claim
    assert(out(102L) === None)      // unmeasurable ≠ clean
  }

  test("independent id spaces: an id-colliding real hit is kept with benchIsSubset=false") {
    val bench = Seq((7L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    // corpus doc ALSO numbered 7 (different document, different source)
    // fully quotes the benchmark — id equality is coincidence here
    val corpus = Seq(
      (7L, "prefix words the quick brown fox jumps over the lazy dog suffix words"))
      .toDF("doc_id", "text")
    // default subset semantics exclude the id-equal pair — the bench doc
    // is still REPORTED (as clean), never silently dropped
    val subset = Contamination.report(corpus, bench, "doc_id", "text").collect()
    assert(subset.length === 1 && subset.head.getDouble(4) === 0.0
      && subset.head.isNullAt(2))
    val indep = Contamination.report(corpus, bench, "doc_id", "text",
      benchIsSubset = false).collect()
    assert(indep.length === 1 && indep.head.getDouble(4) === 1.0)
  }

  test("decontaminate drops the quoting doc, keeps clean docs and the bench rows themselves") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // the bench doc
      (1L, "intro words then the quick brown fox jumps over the lazy dog and more"), // leak
      (2L, "completely different content with nothing shared at all")) // clean
      .toDF("doc_id", "text")
    val survivors = Contamination.decontaminate(
        corpus, corpus.filter($"doc_id" === 100L), "doc_id", "text",
        shingleN = 3, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(100L, 2L)) // leak dropped, bench + clean kept
  }

  test("decontaminate never drops a bench row, even one duplicated by another bench doc") {
    val corpus = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"),
      (40L, "the quick brown fox jumps over the lazy dog"), // bench dup of bench 20
      (3L, "the quick brown fox jumps over the lazy dog too")) // a real leak
      .toDF("doc_id", "text")
    val survivors = Contamination.decontaminate(
        corpus, corpus.filter($"doc_id" % 20 === 0), "doc_id", "text",
        shingleN = 3, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(20L, 40L)) // both bench rows protected; only the leak drops
  }

  test("self-pairs are excluded when the benchmark is drawn from the corpus") {
    val corpus = Seq(
      (20L, "alpha beta gamma delta epsilon zeta"),
      (21L, "alpha beta gamma delta epsilon zeta"), // exact dup of 20
      (22L, "unrelated content words here again")).toDF("doc_id", "text")
    val out = Contamination.report(corpus, corpus.filter($"doc_id" === 20L),
        "doc_id", "text", shingleN = 3, topPerDoc = 1)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 20L) // bench_id
    assert(out.head.getLong(2) === 21L) // top contaminator is the dup, not itself
    assert(out.head.getDouble(4) === 1.0)
  }

  test("shingleOverlap: known jaccard on a constructed corpus; disjoint pairs absent") {
    // g1: shingles of "a b c d" = {a b c, b c d}; g2 identical → J = 1;
    // g3: "a b c x" = {a b c, b c x} → J(g1,g3) = 1/3; g4 disjoint → no row.
    val df = Seq(
      ("g1", "a b c d"), ("g2", "a b c d"),
      ("g3", "a b c x"), ("g4", "p q r s"))
      .toDF("source", "text")
    val out = Contamination.shingleOverlap(df, "source", "text", 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("g1", "g2")) === ((2L, 1.0)))
    assert(out(("g1", "g3")) === ((1L, round3(1.0 / 3))))
    assert(out(("g2", "g3")) === ((1L, round3(1.0 / 3))))
    assert(!out.keySet.exists { case (x, y) => x == "g4" || y == "g4" },
      s"disjoint group paired: ${out.keySet}")
  }

  private def round3(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
