package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline — what the individual
  * operators exist for. One declarative plan:
  *
  *   annotate (lang-id, quality, token counts)   — map-only
  *   → filter (quality floor, length window)     — pushed predicates
  *   → exact dedup (content hash groupBy)        — 1 shuffle
  *   → near-dup prune (MinHash-LSH, keep min id) — sketch + bucket join
  *
  * Everything before the dedup shuffles is a single codegen'd pass over
  * the text column; at 100 TB the pipeline's cost is the scan plus two
  * bounded shuffles. `clean` returns the surviving rows with their
  * annotations; `stats` is the SQL-expressible summary used by the
  * correctness gate (near-dup pruning excluded there — hash sketches
  * aren't oracle-reproducible; the suite covers that stage instead).
  */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.3,
      minTokens: Int = 5,
      maxTokens: Int = 5000,
      nearDupThreshold: Double = 0.5)

  /** Map-only annotation pass: pure `withColumn` expressions — truly no
    * join and no shuffle (a self-join formulation would NOT be collapsed
    * by Catalyst and would scan + tokenize the text twice).
    */
  def annotate(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", TextAnalysis.nTokensCol(col(textCol)).cast("long"))
      .withColumn("quality_score", round(TextAnalysis.qualityScoreCol(col(textCol)), 4))
      .withColumn("predicted_lang", LanguageId.predict(col(textCol)))

  /** Quality gate: predicates over the annotations. */
  def qualityFilter(annotated: DataFrame, cfg: Config): DataFrame =
    annotated.filter(
      col("quality_score") >= cfg.minQuality &&
        col("n_tokens").between(cfg.minTokens, cfg.maxTokens))

  /** Keep the lowest id per exact text. Grouping key is the 128-bit
    * content hash ([[Dedup.contentHash128]], collision odds documented
    * there), not the raw text: the winner-election shuffle then carries
    * (16-byte key, id) rows instead of the corpus' text bytes — the
    * difference between an ~8 GB and an ~100 TB exchange at corpus
    * scale. The semi join on (hash, id) is the only full-width pass.
    */
  def exactDedup(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val h = Dedup.freshName(df, "_graft_ch")
    val withH = df.withColumn(h, Dedup.contentHash128(Seq(col(textCol))))
    val keep = withH
      .select(col(h), col(idCol))
      .groupBy(col(h)).agg(min(col(idCol)).as(idCol))
    withH.join(keep, Seq(h, idCol), "left_semi").drop(h)
  }

  /** Keep the minimum-id representative of every near-dup COMPONENT:
    * the pair relation feeds [[GraphOps.connectedComponents]] and every
    * non-representative node drops. Transitive-closure semantics — a
    * chain of pairwise near-dups collapses to ONE survivor — which is
    * the standard LSH-cluster dedup choice (chained near-dups are
    * near-identical in practice); the conservative alternative, a
    * maximal independent set keeping chain tails whose only duplicate
    * was itself dropped, retains more content at the cost of keeping
    * transitive variants. The earlier drop-every-id_b greedy sat
    * BETWEEN the two semantics (order-dependent on chains) — the
    * component form is principled and deterministic.
    */
  def nearDupPrune(df: DataFrame, cfg: Config,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = Dedup.minhashLshPairs(df, idCol, textCol,
        threshold = cfg.nearDupThreshold)
      .select("id_a", "id_b")
    val losers = GraphOps.connectedComponents(pairs)
      .filter(col("node") =!= col("component")) // non-min of its group
      .select(col("node").as(idCol))
    df.join(losers, idCol, "left_anti")
  }

  /** The full pipeline. Exact dedup runs BEFORE the near-dup prune:
    * mass-duplicated content would otherwise blow past the LSH skew
    * guard's bucket cap (oversized buckets are dropped, so >maxBucket
    * identical copies would all survive a sketch-only prune), and docs
    * shorter than the shingle size have no sketch at all — the exact
    * stage is what catches both.
    */
  def clean(docs: DataFrame, cfg: Config = Config()): DataFrame =
    nearDupPrune(exactDedup(qualityFilter(annotate(docs), cfg)), cfg)

  /** Deterministic, SQL-expressible summary after the exact stages
    * (annotate → filter → exact dedup): per predicted language, the
    * survivor count and mean quality.
    */
  def stats(docs: DataFrame, cfg: Config = Config()): DataFrame =
    exactDedup(qualityFilter(annotate(docs), cfg))
      .groupBy("predicted_lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("quality_score"), 4).as("mean_quality"),
        sum("n_tokens").cast("long").as("total_tokens"))
      .orderBy("predicted_lang")
}
