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

  /** Offline ranking evaluation — the metrics layer every retriever
    * here feeds (recall@k, MRR@k, nDCG@k per query): `run` is a ranked
    * shortlist relation `(queryIdCol, docIdCol, rankCol)` (rank 1..n
    * per query, the shape [[rrfFuse]] and every retriever emit);
    * `qrels` is the graded relevance-judgment relation
    * `(queryIdCol, docIdCol, relCol)` with rel ≥ 0 (0 = judged
    * irrelevant). Emits one row per JUDGED query (a query with no
    * qrels rows has undefined metrics and is absent):
    * `(queryIdCol, n_rel, recall_at_k, mrr, ndcg)`, each metric
    * rounded to `roundTo` —
    *   - recall@k = |{rel > 0} ∩ top-k| / |{rel > 0}| (0 when the
    *     query has no relevant doc),
    *   - MRR@k = 1 / rank of the first relevant doc in the top-k
    *     (0 when none),
    *   - AP@k (binary relevance, TREC convention): the mean over
    *     relevant RETRIEVED positions r of P@r = |{rel > 0} ∩ top-r|/r,
    *     divided by min(n_rel, k) — so a run that retrieves every
    *     relevant doc as early as possible scores 1 even when the
    *     judgment pool exceeds k;
    *   - nDCG@k (Järvelin & Kekäläinen 2002, the exponential-gain
    *     form): DCG = Σ_{r ≤ k} (2^rel − 1)/log2(r + 1) over the run's
    *     ranks, IDCG = the same over rel sorted descending, nDCG =
    *     DCG/IDCG (0 when IDCG = 0, i.e. nothing relevant). DCG is
    *     invariant to tie order (equal rel at permuted positions sums
    *     identically only within a position — so the IDCG window
    *     orders by (rel DESC, doc) for determinism).
    *
    * Scale shape: the run is ≤ k·|queries| rows and qrels is the
    * judgment relation — both queries-scale, never corpus-scale, so
    * every join and window here partitions by query id over bounded
    * groups (the corpus-scale work happened inside the retriever). All
    * arithmetic is powers/logs over small integers — SQL-replayable,
    * so the metric relation itself carries a DuckDB oracle (q135).
    */
  def rankingMetrics(
      run: DataFrame,
      qrels: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      rankCol: String,
      relCol: String,
      k: Int,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val gain = (rel: org.apache.spark.sql.Column) =>
      (pow(lit(2.0), rel.cast("double")) - 1.0)
    val runK = run.filter(col(rankCol) <= k)
      .select(col(queryIdCol), col(docIdCol), col(rankCol).as("_rm_rank"))
    val judged = qrels.select(col(queryIdCol), col(docIdCol),
      col(relCol).cast("double").as("_rm_rel"))
    // per-query totals + ideal DCG from the judgments alone
    val byRel = Window.partitionBy(queryIdCol)
      .orderBy(col("_rm_rel").desc, col(docIdCol))
    val ideal = judged
      .withColumn("_rm_irank", row_number().over(byRel))
      .groupBy(queryIdCol)
      .agg(
        sum(when(col("_rm_rel") > 0, 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("_rm_irank") <= k,
          gain(col("_rm_rel")) / log2(col("_rm_irank") + 1.0))
          .otherwise(lit(0.0))).as("_rm_idcg"))
    // hits = judged docs the run retrieved in its top-k
    val hits = runK.join(judged, Seq(queryIdCol, docIdCol))
      .groupBy(queryIdCol)
      .agg(
        sum(when(col("_rm_rel") > 0, 1L).otherwise(0L)).as("_rm_found"),
        min(when(col("_rm_rel") > 0, col("_rm_rank"))).as("_rm_first"),
        sum(gain(col("_rm_rel")) / log2(col("_rm_rank") + 1.0)).as("_rm_dcg"))
    // AP@k: P@r needs the count of relevant hits at-or-before each
    // relevant position — a window over the ≤ k relevant hits per
    // query (unjudged positions enter only through the rank value,
    // which already encodes them in the denominator)
    val byRank = Window.partitionBy(queryIdCol).orderBy(col("_rm_rank"))
    val apSum = runK.join(judged.filter(col("_rm_rel") > 0),
        Seq(queryIdCol, docIdCol))
      .withColumn("_rm_ri", row_number().over(byRank))
      .groupBy(queryIdCol)
      .agg(sum(col("_rm_ri") / col("_rm_rank").cast("double"))
        .as("_rm_apsum"))
    ideal.join(hits, Seq(queryIdCol), "left")
      .join(apSum, Seq(queryIdCol), "left")
      .select(col(queryIdCol), col("n_rel"),
        round(when(col("n_rel") > 0,
          coalesce(col("_rm_found"), lit(0L)).cast("double") / col("n_rel"))
          .otherwise(lit(0.0)), roundTo).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("_rm_first"), lit(0.0)), roundTo)
          .as("mrr"),
        round(when(col("n_rel") > 0,
          coalesce(col("_rm_apsum"), lit(0.0)) /
            least(col("n_rel"), lit(k.toLong)).cast("double"))
          .otherwise(lit(0.0)), roundTo).as("ap"),
        round(when(col("_rm_idcg") > 0,
          coalesce(col("_rm_dcg"), lit(0.0)) / col("_rm_idcg"))
          .otherwise(lit(0.0)), roundTo).as("ndcg"))
  }
}
