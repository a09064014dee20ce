package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase aggregation through a
  * random-but-deterministic salt.
  *
  * A `groupBy(k)` with one dominant key puts that key's entire volume on
  * one reducer. Salting splits each key into `salt` sub-keys for the
  * first (partial) aggregation, then re-aggregates the partials — the hot
  * key's work spreads over `salt` reducers and the second shuffle carries
  * only `salt` rows per distinct key. The salt is a hash of stable row
  * identity, not `rand()`, so plans stay deterministic and retryable
  * (rand-based salts break task retry idempotence).
  *
  * Results are bit-identical for decomposable aggregates on exact types;
  * for floating sums the summation tree changes — callers that
  * hash-compare should ROUND as usual. (AQE's skew-join handling covers
  * joins; this covers aggregations, which AQE does not re-split.)
  */
object Salting {

  /** count/sum/min/max over salted partials: aggregates that decompose as
    * agg(agg(x)) — the partial column names double as the final names.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltBy: Seq[String],
      salt: Int,
      counts: Seq[String] = Nil, // output names for count(*)
      sums: Seq[(String, String)] = Nil, // (outName, inCol)
      mins: Seq[(String, String)] = Nil,
      maxs: Seq[(String, String)] = Nil): DataFrame = {
    require(counts.nonEmpty || sums.nonEmpty || mins.nonEmpty || maxs.nonEmpty,
      "saltedAggregate needs at least one aggregate (counts/sums/mins/maxs)")
    // pmod(x, 0) is NULL (one salt group = silent no-op skew mitigation)
    // or a runtime DIVIDE_BY_ZERO under ANSI — reject it here instead
    require(salt > 0, s"salt must be positive, got $salt")
    val saltCol = pmod(xxhash64(saltBy.map(col): _*), lit(salt)).as("_salt")
    val partialAggs =
      counts.map(out => count(lit(1)).as(out)) ++
        sums.map { case (out, in) => sum(col(in)).as(out) } ++
        mins.map { case (out, in) => min(col(in)).as(out) } ++
        maxs.map { case (out, in) => max(col(in)).as(out) }
    val finalAggs =
      counts.map(out => sum(col(out)).as(out)) ++
        sums.map { case (out, _) => sum(col(out)).as(out) } ++
        mins.map { case (out, _) => min(col(out)).as(out) } ++
        maxs.map { case (out, _) => max(col(out)).as(out) }
    df.groupBy((keys.map(col) :+ saltCol): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Key-skew diagnostic for a `(relation, key)` pair — the pre-shuffle
    * health report that decides whether a join/agg on `keyCol` needs
    * [[saltedAggregate]] / AQE skew handling at all: one row with the
    * row and distinct-key counts, the heaviest key's share, the top-
    * `topK` keys' combined share, and the EXACT Gini coefficient of
    * the key-count distribution (0 = uniform, → 1 = one key owns
    * everything), via the rank formula G = 2·Σᵢ i·cᵢ / (K·T) − (K+1)/K
    * over counts ranked ascending.
    *
    * Scale shape: the only corpus-scale exchange is the map-side-
    * combined key count; everything after runs on the (key, count)
    * relation. Ranking uses [[Sampling.contiguousIndex]] — range-
    * partitioned two-phase ranks, NOT a `row_number` over a global
    * ORDER BY, which would put every distinct key on one reducer (the
    * exact bottleneck this report exists to prevent). The top-`topK`
    * sum is a TakeOrdered over counts; the final product is two 1-row
    * frames cross-joined. Gini arithmetic is integer sums divided once
    * in double, ROUNDed to 6 — engine-replayable.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK=$topK must be >= 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val indexed = Sampling.contiguousIndex(
        counts.withColumn("_sk", struct(col("cnt"), col(keyCol))),
        "_sk", nShards = 32)
      .drop("_sk")
    val base = indexed.agg(
      sum("cnt").cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_keys"),
      max("cnt").cast("long").as("max_count"),
      sum(col("cnt") * (col("global_idx") + lit(1L))).as("_rw"))
    val top = counts.orderBy(col("cnt").desc, col(keyCol).desc).limit(topK)
      .agg(coalesce(sum("cnt"), lit(0L)).cast("long").as("_topc"))
    base.crossJoin(top).select(
      col("n_rows"), col("n_keys"), col("max_count"),
      round(col("max_count").cast("double") / col("n_rows"), 6)
        .as("max_share"),
      round(col("_topc").cast("double") / col("n_rows"), 6)
        .as(s"top${topK}_share"),
      round((lit(2.0) * col("_rw")) / (col("n_keys") * col("n_rows")).cast("double")
          - (col("n_keys") + lit(1L)).cast("double") / col("n_keys").cast("double"),
        6).as("gini"))
  }
}
