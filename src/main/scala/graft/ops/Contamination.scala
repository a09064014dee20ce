package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: how much of a held-out evaluation
  * set leaks into a training corpus.
  *
  * The measure is n-gram CONTAINMENT, |B ∩ C| / |B| over word-shingle
  * sets — asymmetric on purpose: a benchmark document fully quoted
  * inside a much longer training document is 100 % contaminated even
  * though symmetric Jaccard would be near zero.
  *
  * Output is a ranked REPORT (top-`topPerDoc` overlapping corpus docs
  * per benchmark doc with their scores), not a thresholded join: in
  * practice the threshold is a reviewing decision, and a report of the
  * worst offenders is what the decontamination loop consumes.
  *
  * Scale shape: the same inverted-index equi-join as
  * [[Dedup.ngramJaccardPairs]] (work ∝ actually-shared shingles, never
  * |bench|·|corpus|). The benchmark side is usually tiny, and AQE
  * broadcasts it from runtime stats when it is — deliberately not a
  * hard hint, because a large holdout post-explode must degrade to a
  * shuffle join, not OOM. The final per-bench-doc top-k is a
  * rank-filter window planned as WindowGroupLimit (map-side pre-prune
  * before the exchange).
  */
object Contamination {

  /** @param benchIsSubset when the benchmark rows are DRAWN FROM the
    *   corpus (shared id space), a doc trivially "contaminates" itself —
    *   exclude id-equal pairs. Pass `false` for independently-numbered
    *   corpora: there id equality is coincidence, and excluding such a
    *   pair would suppress a real hit (the exact miss this operator
    *   exists to catch).
    */
  /** The raw (bench_id, corpus_id, n_shared, containment) overlap
    * relation — what both [[report]] (ranked view) and [[decontaminate]]
    * (removal set) consume.
    */
  def containmentPairs(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      benchIsSubset: Boolean = true): DataFrame = {
    def postings(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        TextFunctions.shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col(as), size(col("sh")).as(s"${as}_sz"), explode(col("sh")).as("shingle"))
    val b = postings(bench, "bench_id")
    val c = postings(corpus, "corpus_id").drop("corpus_id_sz")
    // No hard broadcast hint: a benchmark is often tiny (AQE broadcasts
    // it from runtime stats), but a 5%-of-corpus holdout post-explode is
    // not — a forced broadcast would OOM instead of degrading to a
    // shuffle join.
    val joined = b.join(c, Seq("shingle"))
    (if (benchIsSubset) joined.filter(col("bench_id") =!= col("corpus_id"))
     else joined)
      .groupBy("bench_id", "corpus_id", "bench_id_sz")
      .agg(count(lit(1)).as("n_shared")) // shingle sets are distinct ⇒ = |B ∩ C|
      .select(col("bench_id"), col("corpus_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("bench_id_sz"), 6).as("containment"))
  }

  def report(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      topPerDoc: Int = 1,
      benchIsSubset: Boolean = true): DataFrame = {
    val overlaps = containmentPairs(corpus, bench, idCol, textCol, shingleN, benchIsSubset)
    val w = Window.partitionBy("bench_id")
      .orderBy(col("containment").desc, col("corpus_id"))
    val topk = overlaps
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topPerDoc)
      .select("bench_id", "rk", "corpus_id", "n_shared", "containment")
    // Every bench doc appears in the report — this operator's scaladoc
    // warns about silent-empty outputs, so a doc must never vanish:
    //   - measurable, no overlap → containment 0.0 (verified clean)
    //   - shorter than shingleN → containment NULL (UNMEASURABLE — not
    //     the same claim as clean, and the reviewer must see the
    //     difference)
    val roster = bench
      .select(col(idCol).as("bench_id"),
        (size(TextFunctions.shingleSet(col(textCol), shingleN)) > 0).as("_measurable"))
    roster.join(topk, Seq("bench_id"), "left")
      .select(
        col("bench_id"),
        coalesce(col("rk"), lit(1L)).as("rk"),
        col("corpus_id"),
        when(col("_measurable"), coalesce(col("n_shared"), lit(0L))).as("n_shared"),
        when(col("_measurable"), coalesce(col("containment"), lit(0.0))).as("containment"))
  }

  /** The APPLY side of the decontamination loop: drop every corpus doc
    * whose containment of ANY benchmark doc reaches `threshold`.
    * When the benchmark is drawn from the corpus (`benchIsSubset`),
    * bench rows themselves are NEVER dropped — not just their
    * self-pairs: a bench doc near-duplicated by ANOTHER bench doc
    * would otherwise land in the removal set, silently shrinking the
    * held-out set it exists to protect. The operator removes leaks,
    * not benchmark. Anti-join on the (distinct) removal ids: the
    * corpus never shuffles for the decision, only streams past the
    * removal set (AQE broadcasts it — it is at most
    * |bench| × docs-over-threshold ids).
    */
  def decontaminate(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      benchIsSubset: Boolean = true): DataFrame = {
    val contaminated = containmentPairs(corpus, bench, idCol, textCol, shingleN, benchIsSubset)
      .filter(col("containment") >= threshold)
      .select(col("corpus_id").as(idCol))
      .distinct()
    val dropIds =
      if (benchIsSubset)
        contaminated.join(bench.select(col(idCol)), Seq(idCol), "left_anti")
      else contaminated
    corpus.join(dropIds, Seq(idCol), "left_anti")
  }

  /** Cross-group shingle-overlap matrix: for every pair of groups
    * (sources, snapshots, providers), the Jaccard similarity of their
    * DISTINCT word-`shingleN`-gram sets — the corpus-governance view of
    * "how much do my sources repeat each other" that decides dedup
    * priorities and mixture weights before any document-level work.
    *
    * Scale shape: the unit of work is the distinct (group, shingle)
    * relation, keyed by a 128-bit shingle hash so no shingle TEXT ever
    * shuffles (collision odds documented at [[Dedup.contentHash128]]).
    * The pair counts come from the standard inverted-index self-join:
    * cost ∝ Σ_shingle |groups sharing it|² bounded by (#groups)² per
    * shingle — #groups is small by definition (it's a reporting
    * dimension), so the join never goes corpus-quadratic. Group sizes
    * broadcast back. Pairs sharing nothing are absent (the report is
    * sparse, not zero-filled).
    */
  def shingleOverlap(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      shingleN: Int = 3): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val sh = df
      .filter(size(toks) >= shingleN)
      .select(col(groupCol),
        explode(graft.functions.GraftFunctions.shingles(toks, shingleN)).as("_graft_sh"))
      .select(col(groupCol), Dedup.contentHash128(Seq(col("_graft_sh"))).as("_graft_h"))
      .distinct()
    val sz = sh.groupBy(col(groupCol)).agg(count(lit(1)).as("_graft_n"))
    val a = sh.select(col(groupCol).as("group_a"), col("_graft_h"))
    val b = sh.select(col(groupCol).as("group_b"), col("_graft_h"))
    a.join(b, Seq("_graft_h"))
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sz.select(col(groupCol).as("group_a"), col("_graft_n").as("_graft_na"))),
        Seq("group_a"))
      .join(broadcast(sz.select(col(groupCol).as("group_b"), col("_graft_n").as("_graft_nb"))),
        Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("_graft_na") + col("_graft_nb") - col("n_common")), 6).as("jaccard"))
  }
}
