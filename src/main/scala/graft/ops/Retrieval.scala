package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion layer over the engine's retrievers — the glue that turns
  * the lexical ([[TextAnalysis.bm25Join]]) and dense
  * ([[VectorOps.bruteKnnJoin]] / [[VectorOps.ivfKnnJoin]] /
  * [[Pq.pqIvfProbeFrom]]) batch-retrieval shapes into one hybrid
  * ranking, the standard production RAG composition.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse two per-query shortlists by
    * `score(d) = Σ_lists 1 / (kRrf + rank_list(d))`, a document absent
    * from a list contributing 0 — rank-based, so the two retrievers'
    * incomparable score scales (BM25 vs cosine) never need calibration.
    *
    * Inputs are shortlist relations `(queryIdCol, docIdCol, rankCol)`
    * with rank 1..k per query (the shape every retriever here emits).
    * Output: `(queryIdCol, docIdCol, rrf, rank)`, the fused top-`k` per
    * query — `rrf` rounded to `roundTo` BEFORE ranking, ties by doc id,
    * so the result is a pure function of the input rankings.
    *
    * Scale shape: both inputs are already per-query top-k shortlists —
    * ≤ k·|queries| rows each — so the full-outer join on
    * (query, doc) and the fused re-rank window are shortlist-scale,
    * never corpus-scale; the corpus-scale work happened inside the
    * retrievers, each in its own optimal plan (postings join /
    * broadcast-NLJ / pruned index probe).
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      rankCol: String,
      k: Int,
      kRrf: Int = 60,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(kRrf >= 1, s"kRrf=$kRrf must be >= 1")
    val ra = a.select(col(queryIdCol), col(docIdCol), col(rankCol).as("rank_a"))
    val rb = b.select(col(queryIdCol), col(docIdCol), col(rankCol).as("rank_b"))
    // USING-style full outer join coalesces the key columns, so a doc
    // found by only one retriever still carries its (query, doc) key
    val joined = ra.join(rb, Seq(queryIdCol, docIdCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_b")), lit(0.0)),
        roundTo))
    val byFused = Window.partitionBy(queryIdCol)
      .orderBy(col("rrf").desc, col(docIdCol))
    joined
      .withColumn("rank", row_number().over(byFused).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(docIdCol), col("rrf"), col("rank"))
  }
}
