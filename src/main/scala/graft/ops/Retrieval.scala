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

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) of a per-query shortlist: greedily select `k` documents
    * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)` — the
    * standard diversity pass that keeps a RAG context window from
    * filling with near-duplicates of the top hit.
    *
    * The greedy argmax is inherently order-dependent (each pick
    * changes every remaining candidate's penalty), so this is the
    * justified `flatMapGroups` case (the Packing/Multimodal rule): the
    * per-query group is SHORTLIST-bounded, never corpus-scale, and a
    * group larger than `maxShortlist` fails fast instead of buffering
    * unbounded state on an executor. Candidate vectors join onto the
    * shortlist by doc id first — shortlist-scale work; the corpus
    * never enters.
    *
    * Determinism: candidates are processed in (rel desc, doc id) order
    * and every argmax tie breaks by doc id, so the selection is a pure
    * function of the shortlist. Zero-norm vectors take cosine 0
    * against everything (they penalize nothing, matching the
    * retrievers' own zero-norm handling).
    *
    * @param shortlist `(queryIdCol, docIdCol, relCol)` per-query candidates
    * @param vectors `(idCol, vecCol)` embeddings covering the
    *        shortlisted docs (extra rows are fine — semi-joined away);
    *        a shortlisted doc with no vector is dropped with its query
    *        (inner join), surfacing coverage gaps as missing rows, not
    *        silent zero-penalty picks
    * @return `(queryIdCol, docIdCol, rank, mmr)` — rank 1..k per query
    */
  def mmrRerank(
      shortlist: DataFrame,
      vectors: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      relCol: String,
      idCol: String,
      vecCol: String,
      k: Int,
      lambda: Double = 0.7,
      maxShortlist: Int = 4096,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda out of [0,1]")
    require(maxShortlist >= 1, s"maxShortlist=$maxShortlist must be >= 1")
    val spark = shortlist.sparkSession
    import spark.implicits._
    val joined = shortlist
      .select(col(queryIdCol).cast("long").as("q"),
        col(docIdCol).cast("long").as("d"),
        col(relCol).cast("double").as("rel"))
      .join(vectors.select(col(idCol).cast("long").as("d"),
          transform(col(vecCol), x => x.cast("double")).as("vec")),
        Seq("d"))
      .select(col("q"), col("d"), col("rel"), col("vec"))
      .as[(Long, Long, Double, Seq[Double])]
    val picked = joined.groupByKey(_._1).flatMapGroups { (q, it) =>
      val cands = it.toArray.sortBy(t => (-t._3, t._2))
      if (cands.length > maxShortlist)
        throw new IllegalStateException(
          s"mmrRerank: query $q has ${cands.length} shortlist rows " +
            s"(> maxShortlist=$maxShortlist) — cap the shortlist upstream")
      val vecs = cands.map(_._4.toArray)
      val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
      // candidate–candidate similarities are ROUNDED to roundTo before
      // they enter the penalty — the argmax then compares the same
      // "nice" doubles on every platform AND in the generated DuckDB
      // oracle's replay (mmrOracleSql), so FP argmax ties are pinned
      // rather than lucky; BigDecimal HALF_UP is exactly Spark's
      // round() on doubles (the shortlist rel is already rounded by
      // bruteKnnJoin's round-before-rank contract)
      def cos(i: Int, j: Int): Double =
        if (norms(i) == 0 || norms(j) == 0) 0.0
        else {
          var s = 0.0; var t = 0
          val a = vecs(i); val b = vecs(j)
          while (t < math.min(a.length, b.length)) { s += a(t) * b(t); t += 1 }
          java.math.BigDecimal.valueOf(s / (norms(i) * norms(j)))
            .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
        }
      val n = cands.length
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
      val used = new Array[Boolean](n)
      val maxSim = Array.fill(n)(0.0)
      var rank = 1
      while (rank <= math.min(k, n)) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!used(i)) {
            val s = lambda * cands(i)._3 - (1 - lambda) * maxSim(i)
            // candidates are rel-then-id sorted, so strict > keeps the
            // first (smallest-id) of any score tie
            if (s > bestScore) { bestScore = s; best = i }
          }
          i += 1
        }
        used(best) = true
        selected += ((cands(best)._2, rank, bestScore))
        var j = 0
        while (j < n) {
          if (!used(j)) maxSim(j) = math.max(maxSim(j), cos(j, best))
          j += 1
        }
        rank += 1
      }
      selected.iterator.map { case (d, r, s) => (q, d, r.toLong, s) }
    }
    // NO final rounding: the score is already a bit-exact pure function
    // of the ROUNDED rel and sim inputs (identical doubles in any IEEE
    // engine), while rounding it again would land on the half-boundary
    // grid the inputs' 10^-roundTo steps create — exactly where Spark's
    // shortest-decimal HALF_UP and DuckDB's binary-value ROUND disagree
    // (caught live by the q155 gate on first conversion)
    picked.toDF(queryIdCol, docIdCol, "rank", "mmr")
  }

  /** Generated DuckDB oracle for [[mmrRerank]] over the embeddings
    * table — the q154/pageRank unrolling pattern applied to the greedy
    * Carbonell–Goldstein chain: the selection is a FIXED-DEPTH argmax
    * chain (k picks), so each pick is one window CTE and each state
    * update one join CTE, materialized so DuckDB never re-expands the
    * chain. Cross-engine exactness leans on three pins:
    *   - the shortlist relation replays [[VectorOps.bruteKnnJoin]]'s
    *     round-before-rank contract (the q114 oracle, verbatim);
    *   - candidate–candidate similarities are ROUNDED to `roundTo`
    *     INSIDE the engine's greedy loop ([[mmrRerank]]'s documented
    *     contract), so both engines compare identical doubles at every
    *     argmax — FP ties are pinned, not lucky;
    *   - λ and (1 − λ) are interpolated as shortest-round-trip Scala
    *     doubles, which DuckDB parses back to the identical bits (the
    *     Stats.PoissonCdf convention).
    *
    * `queriesPred` is a SQL boolean over the query alias `q` (e.g.
    * `"q.vec_id < 16"`) selecting the query batch; the corpus is the
    * whole embeddings table (the engine side must select the same
    * sets).
    */
  def mmrOracleSql(
      queriesPred: String,
      shortlistK: Int,
      k: Int,
      lambda: Double,
      roundTo: Int = 6): String = {
    require(k >= 1 && shortlistK >= 1, "mmrOracleSql: k and shortlistK >= 1")
    val lam = lambda.toString
    val oneMinusLam = (1 - lambda).toString
    // picks 2..k: score the remaining set under the current penalty,
    // take the argmax, fold the new pick into every survivor's maxSim
    val its = (2 to k).map { i =>
      val prevR = s"mmr_r${i - 1}"
      s"""mmr_s$i AS MATERIALIZED (SELECT q, d, rel, ms,
         |    ${lam}e0 * rel - ${oneMinusLam}e0 * ms AS score
         |  FROM $prevR),
         |mmr_p$i AS MATERIALIZED (SELECT q, d, rel, score FROM (
         |    SELECT q, d, rel, score, row_number() OVER (PARTITION BY q
         |      ORDER BY score DESC, rel DESC, d) rn FROM mmr_s$i)
         |  WHERE rn = 1),
         |mmr_r$i AS MATERIALIZED (SELECT r.q, r.d, r.rel,
         |    greatest(r.ms, COALESCE(s.cs, 0.0e0)) AS ms
         |  FROM $prevR r
         |  JOIN mmr_p$i p ON r.q = p.q AND r.d <> p.d
         |  LEFT JOIN mmr_sim s ON s.q = r.q AND s.d1 = r.d AND s.d2 = p.d)"""
        .stripMargin
    }.mkString(",\n")
    // the output score is deliberately UNROUNDED on both sides — see
    // mmrRerank's closing note (it is a pure function of rounded
    // inputs; re-rounding lands on cross-engine half-boundaries)
    val picks = (1 to k).map { i =>
      s"SELECT q AS q_id, d AS n_id, CAST($i AS BIGINT) AS \"rank\", " +
        s"score AS mmr FROM mmr_p$i"
    }.mkString("\nUNION ALL ")
    s"""WITH mmr_e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) v
       |  FROM embeddings),
       |mmr_n AS MATERIALIZED (SELECT vec_id, v,
       |    sqrt(list_dot_product(v, v)) nrm
       |  FROM mmr_e WHERE list_dot_product(v, v) > 0),
       |mmr_sc AS MATERIALIZED (SELECT q.vec_id q, c.vec_id d,
       |    ROUND(list_dot_product(c.v, q.v) / (c.nrm * q.nrm), $roundTo) rel
       |  FROM mmr_n c, mmr_n q
       |  WHERE ($queriesPred) AND c.vec_id <> q.vec_id),
       |mmr_base AS MATERIALIZED (SELECT q, d, rel FROM (
       |    SELECT q, d, rel, row_number() OVER (PARTITION BY q
       |      ORDER BY rel DESC, d) rk FROM mmr_sc)
       |  WHERE rk <= $shortlistK),
       |mmr_sim AS MATERIALIZED (SELECT b1.q, b1.d d1, b2.d d2,
       |    ROUND(CASE WHEN n1.nrm = 0 OR n2.nrm = 0 THEN 0.0e0
       |      ELSE list_dot_product(n1.v, n2.v) / (n1.nrm * n2.nrm) END,
       |      $roundTo) cs
       |  FROM mmr_base b1
       |  JOIN mmr_base b2 ON b1.q = b2.q AND b1.d <> b2.d
       |  JOIN mmr_n n1 ON n1.vec_id = b1.d
       |  JOIN mmr_n n2 ON n2.vec_id = b2.d),
       |mmr_s1 AS MATERIALIZED (SELECT q, d, rel,
       |    ${lam}e0 * rel - ${oneMinusLam}e0 * 0.0e0 AS score
       |  FROM mmr_base),
       |mmr_p1 AS MATERIALIZED (SELECT q, d, rel, score FROM (
       |    SELECT q, d, rel, score, row_number() OVER (PARTITION BY q
       |      ORDER BY score DESC, rel DESC, d) rn FROM mmr_s1)
       |  WHERE rn = 1),
       |mmr_r1 AS MATERIALIZED (SELECT b.q, b.d, b.rel,
       |    greatest(0.0e0, COALESCE(s.cs, 0.0e0)) AS ms
       |  FROM mmr_base b
       |  JOIN mmr_p1 p ON b.q = p.q AND b.d <> p.d
       |  LEFT JOIN mmr_sim s ON s.q = b.q AND s.d1 = b.d AND s.d2 = p.d),
       |$its
       |SELECT * FROM ($picks)
       |ORDER BY q_id, "rank"""".stripMargin
  }
}
