package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics at corpus scale.
  *
  * Spark's exact `percentile` aggregate buffers EVERY value of a group
  * in executor memory (an OpenHashMap per group) — fine for
  * [[Sampling.quantileBucket]]'s global cuts at gate scale, a
  * scale-killer for a billion-row group. The operators here compute the
  * same exact ranks with bounded memory: collapse to the value
  * HISTOGRAM first (distinct-value-bound, map-side combined), then do
  * rank arithmetic over exclusive prefix sums — never buffering a
  * group's raw values anywhere.
  */
object Stats {

  /** Exact discrete quantiles per group with bounded memory: for each
    * `(name, num, den)` in `quantiles`, the value at 1-indexed rank
    * `ceil(n·num/den)` of the group's sorted `valueCol` (the
    * lower/"disc" convention — always an element of the group, never
    * interpolated), plus `n_rows`, as one row per group.
    *
    * All rank arithmetic is INTEGER (`ceil(n·num/den)` =
    * `(n·num + den − 1) div den`), so the relation is replayable
    * bit-for-bit by a SQL oracle — no floating quantile conventions to
    * match across engines.
    *
    * Scale shape: one map-side-combined groupBy collapses the corpus to
    * the (group, value) histogram; [[Sampling.prefixSumBy]] ranks the
    * histogram two-phase (a hot group spans many shards — never a
    * per-group window over raw rows); the totals join and the final
    * quantile agg run on histogram-scale rows. Memory per task is
    * bounded by partition size, never by group size.
    */
  /** As [[exactQuantilesByGroup]], but each row carries an integer
    * `weightCol` mass and quantiles are over the WEIGHTED distribution
    * — e.g. with token counts as weights, "the median token lives in a
    * document of length p50". `n_rows` reports the group's total
    * weight. Same histogram/prefix-sum machinery, same integer rank
    * arithmetic (`ceil(W·num/den)` over cumulative weight).
    */
  def weightedQuantilesByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      quantiles: Seq[(String, Int, Int)] =
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)),
      nShards: Int = 32): DataFrame =
    quantilesImpl(df, groupCols, valueCol, Some(weightCol), quantiles, nShards)

  def exactQuantilesByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      quantiles: Seq[(String, Int, Int)] =
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)),
      nShards: Int = 32): DataFrame =
    quantilesImpl(df, groupCols, valueCol, None, quantiles, nShards)

  private def quantilesImpl(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: Option[String],
      quantiles: Seq[(String, Int, Int)],
      nShards: Int): DataFrame = {
    require(groupCols.nonEmpty, "exactQuantilesByGroup needs >= 1 group column")
    require(quantiles.nonEmpty, "exactQuantilesByGroup needs >= 1 quantile")
    quantiles.foreach { case (name, num, den) =>
      require(num >= 1 && den >= 1 && num <= den,
        s"quantile $name: $num/$den must satisfy 0 < num/den <= 1")
    }
    val reservedClash = (quantiles.map(_._1) :+ "n_rows")
      .filter(n => df.columns.exists(_.equalsIgnoreCase(n)) ||
        groupCols.exists(_.equalsIgnoreCase(n)))
    require(reservedClash.isEmpty,
      s"exactQuantilesByGroup writes ${reservedClash.mkString("/")} but the " +
        "input/group columns already use the name(s) — rename before calling")
    val cnt = Dedup.freshName(df, "_st_cnt")
    val tot = Dedup.freshName(df, "_st_tot")
    val gcols = groupCols.map(col)
    def mass = weightCol
      .map(w => sum(col(w).cast("long")))
      .getOrElse(count(lit(1)))
    val hist = df.groupBy((gcols :+ col(valueCol)): _*)
      .agg(mass.as(cnt))
    val ranked = Sampling.prefixSumBy(hist, groupCols, valueCol, cnt, nShards)
    val totals = df.groupBy(gcols: _*).agg(mass.as(tot))
    // histogram-scale equi-join on the group key (totals is one row per
    // group; Catalyst broadcasts it when small, shuffles when not)
    val joined = ranked.join(totals, groupCols)
    def rank(num: Int, den: Int): Column =
      expr(s"(`$tot` * ${num}L + ${den - 1}L) div ${den}L")
    val qCols = quantiles.map { case (name, num, den) =>
      val r = rank(num, den)
      max(when(col("cum_sum") < r && r <= col("cum_sum") + col(cnt),
        col(valueCol))).as(name)
    }
    joined.groupBy(gcols: _*)
      .agg(max(col(tot)).cast("long").as("n_rows"), qCols: _*)
  }
}
