package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    .select(col("doc_id"), TextFunctions.wsTokenCount(col("text")).cast("long").as("n_tokens"))

  test("every doc lands in exactly one bin; no multi-doc bin exceeds the budget") {
    val budget = 512L
    val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", budget, partitions = 8)
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    val bins = packed.groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total"))
    val over = bins.filter(col("total") > budget && col("n_docs") > 1).count()
    assert(over === 0, "multi-doc bin over budget")
  }

  test("oversized doc isolates in its own bin instead of being dropped") {
    val df = Seq((1L, 100L), (2L, 2000L), (3L, 100L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packGreedy(df, "doc_id", "n_tokens", 512, partitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(packed.keySet === Set(1L, 2L, 3L))
    // doc 2 shares a bin with nobody
    assert(!packed.exists { case (id, b) => id != 2L && b == packed(2L) })
  }

  test("NULL or uncastable ids/token counts fail with a readable error, not an encoder NPE") {
    val df = Seq((Some(1L), Some(10L)), (Some(2L), None))
      .toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Packing.packGreedy(df, "doc_id", "n_tokens", 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("packGreedy")), s"got: $e")
  }

  test("deterministic across runs and usefully dense on the corpus") {
    val budget = 512L
    def run() = Packing.packGreedy(docs, "doc_id", "n_tokens", budget, partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() === run())
    val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", budget, partitions = 8)
    val nBins = packed.select("bin_id").distinct().count()
    val totalTokens = docs.agg(sum("n_tokens")).head().getLong(0)
    val lowerBound = math.ceil(totalTokens.toDouble / budget)
    // next-fit on this corpus should stay within 2x of the bin-count
    // lower bound (i.e. >= 50% average fill)
    assert(nBins <= 2 * lowerBound, s"$nBins bins vs lower bound $lowerBound")
  }

  test("concatChunks: hand fixture — boundary-crossing docs split exactly; empty docs absent") {
    // stream (blockSize 4): doc1 [0..2], doc2 [3..8], doc4 [9..9]
    val df = Seq(
      (1L, "a b c"),            // 3 tokens → block 0
      (2L, "d e f g h i"),      // 6 tokens → blocks 0(1), 1(4), 2(1)
      (3L, ""),                 // empty → no rows
      (4L, "j"))                // 1 token → block 2
      .toDF("doc_id", "text")
    val got = Packing.concatChunks(df, "doc_id", "text", blockSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (0L, 1L, 3L), (0L, 2L, 1L), (1L, 2L, 4L), (2L, 2L, 1L), (2L, 4L, 1L)))
  }

  test("concatChunks: corpus invariants — per-doc tokens conserved, every block full except the last, blocks contiguous") {
    val text = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(col("doc_id"), col("text"))
    val blockSize = 256L
    val chunks = Packing.concatChunks(text, "doc_id", "text", blockSize.toInt).cache()
    try {
      // conservation: each doc's chunk tokens sum to its token count
      val perDoc = chunks.groupBy("doc_id").agg(sum("n_tokens").as("got"))
      val want = text.select(col("doc_id"),
        size(array_remove(TextFunctions.tokens(col("text")), ""))
          .cast("long").as("want")).filter(col("want") > 0)
      assert(perDoc.join(want, Seq("doc_id"), "full")
        .filter(col("got").isNull || col("want").isNull || col("got") =!= col("want"))
        .count() === 0L)
      // every block holds exactly blockSize tokens except the last
      val blocks = chunks.groupBy("block_id").agg(sum("n_tokens").as("t"))
      val maxBlock = blocks.agg(max("block_id")).head().getLong(0)
      assert(blocks.filter(col("block_id") < maxBlock && col("t") =!= blockSize)
        .count() === 0L)
      // contiguous ids 0..maxBlock
      assert(blocks.count() === maxBlock + 1)
    } finally chunks.unpersist()
  }

  test("concatChunkBlocks: hand fixture — content, boundaries, and membership agree with concatChunks") {
    val df = Seq(
      (1L, "a b c"), (2L, "d e f g h i"), (3L, ""), (4L, "j"))
      .toDF("doc_id", "text")
    val got = Packing.concatChunkBlocks(df, "doc_id", "text", blockSize = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // stream: [a b c d | e f g h | i j]
    assert(got(0L) === (("a b c d", 4L, 2L, "0,3")))
    assert(got(1L) === (("e f g h", 4L, 1L, "")))
    assert(got(2L) === (("i j", 2L, 2L, "1")))
  }

  test("concatChunkBlocks: corpus — concatenation of blocks reproduces the corpus token stream exactly") {
    val text = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(col("doc_id"), col("text"))
    val blocks = Packing.concatChunkBlocks(text, "doc_id", "text", blockSize = 256)
      .orderBy("block_id").collect()
    val stream = blocks.flatMap(_.getString(1).split(" ")).toSeq
    val orig = text.orderBy("doc_id").collect()
      .flatMap(_.getString(1).split(" ").filter(_.nonEmpty)).toSeq
    assert(stream === orig)
    // membership relation agrees with the counts-only q160 operator
    val fromBlocks = blocks.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fromCounts = Packing.concatChunks(text, "doc_id", "text", blockSize = 256)
      .groupBy("block_id").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromBlocks === fromCounts)
  }

  test("slidingChunks: overlap layout on a hand fixture; coverage and stride invariants on the corpus") {
    val df = Seq((1L, "a b c d e f g"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val got = Packing.slidingChunks(df, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // doc 1 (7 toks): starts 0, 3, 6 → "a b c d", "d e f g", "g"
    assert(got === Map(
      (1L, 0L) -> (("a b c d", 4L)), (1L, 1L) -> (("d e f g", 4L)),
      (1L, 2L) -> (("g", 1L)), (2L, 0L) -> (("x", 1L))))
    // corpus: every token index is covered by some chunk; stride gaps never exceed window
    val docs0 = Tables.load(spark, TestSpark.Sf001, "documents")
    val chunks = Packing.slidingChunks(docs0, "doc_id", "text", window = 64, stride = 48)
    val agg = chunks.groupBy("doc_id")
      .agg(max(col("chunk_id") * 48 + col("n_tokens")).as("covered"),
        count(lit(1)).as("nc"))
    val n = docs0.select(col("doc_id"),
      size(array_remove(TextFunctions.tokens(col("text")), "")).cast("long").as("n"))
      .filter(col("n") > 0)
    // last chunk reaches exactly the end; chunk count = ceil(max(n-? )/stride)
    assert(agg.join(n, "doc_id")
      .filter(col("covered") =!= col("n") ||
        col("nc") =!= expr("(n - 1) div 48 + 1")).count() === 0L)
  }
}
