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
}
