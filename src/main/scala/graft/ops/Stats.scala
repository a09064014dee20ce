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

  /** Per-group percent-rank lookup table (SQL `percent_rank()`
    * semantics: `(rank − 1)/(n − 1)` with rank = 1 + count of strictly
    * smaller values, ties sharing the value; 0.0 for single-row
    * groups) — the CDF/feature-normalization map ("this doc is longer
    * than 93% of its source"). One row per DISTINCT (group, value);
    * join it back to the row relation to normalize rows.
    *
    * Scale shape: the corpus collapses to the (group, value) histogram
    * in one map-side-combined agg, [[Sampling.prefixSumBy]] ranks it
    * two-phase, and the totals join is histogram-scale — NEVER the
    * whole-partition window the equivalent SQL uses (a hot group would
    * put its entire row set through one task's sort; see the q149
    * grouped-AUC lift for the measured cost of that shape).
    */
  def percentRankByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      nShards: Int = 32): DataFrame = {
    require(groupCols.nonEmpty, "percentRankByGroup needs >= 1 group column")
    val cnt = Dedup.freshName(df, "_pr_cnt")
    val tot = Dedup.freshName(df, "_pr_tot")
    val gcols = groupCols.map(col)
    val hist = df.groupBy((gcols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as(cnt))
    val ranked = Sampling.prefixSumBy(hist, groupCols, valueCol, cnt, nShards)
    val totals = df.groupBy(gcols: _*).agg(count(lit(1)).as(tot))
    ranked.join(totals, groupCols)
      .select(gcols :+ col(valueCol) :+
        round(when(col(tot) > 1,
          col("cum_sum").cast("double") / (col(tot) - 1).cast("double"))
          .otherwise(lit(0.0)), 6).as("pct_rank"): _*)
  }

  /** Benford's-law first-significant-digit screen per group: observed
    * digit shares against the log10(1 + 1/d) expectation, plus the
    * group's Pearson χ² — the data-QA / fabricated-numbers screen
    * (naturally-generated multiplicative quantities track Benford;
    * templated or synthetic columns flatten or spike). Non-positive
    * values carry no first significant digit and are excluded (their
    * count is visible as n_group vs the digit-row sum). Every group
    * emits all nine digit rows (zero-count digits included — χ² needs
    * them), each carrying the group's n and χ².
    *
    * Scale shape: the digit extract is a map-only projection, the
    * digit histogram a (group, digit) hash agg with map-side combine
    * (≤ 9 cells per group per task), the digit spine a broadcast-sized
    * per-group cross, and χ² a ≤ 9-row-per-group second agg — nothing
    * past the scan exceeds 9×|groups| rows.
    */
  def benfordScreen(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "benfordScreen needs >= 1 group column")
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("double")
    // first significant digit via the decimal rendering (strip every
    // non-1-9 char; scientific-notation exponents only contribute
    // characters AFTER the mantissa's lead digit) — exact, where a
    // floor(log10) formulation can misdigit on a libm ulp (10^k reads
    // as 9.999…) and drift across engines
    val digit = substring(
      regexp_replace(v.cast("string"), "[^1-9]", ""), 1, 1).cast("int")
    val counts = df.filter(v > 0)
      .select(gcols :+ digit.as("digit"): _*)
      .groupBy(gcols :+ col("digit"): _*)
      .agg(count(lit(1)).as("n_d"))
    val totals = counts.groupBy(gcols: _*).agg(sum("n_d").as("n"))
    val spine = totals.select(gcols :+
      explode(sequence(lit(1), lit(9))).as("digit"): _*)
    val filled = spine
      .join(counts, groupCols :+ "digit", "left")
      .join(totals, groupCols)
      .select(gcols ++ Seq(col("digit"),
        coalesce(col("n_d"), lit(0L)).as("n_d"), col("n")): _*)
    val expected = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
    val scored = filled.withColumn("_exp_n", expected * col("n"))
      .withColumn("_chi_term",
        (col("n_d") - col("_exp_n")) * (col("n_d") - col("_exp_n")) / col("_exp_n"))
    val chi = scored.groupBy(gcols: _*)
      .agg(round(sum("_chi_term"), 4).as("chi2"))
    scored.join(chi, groupCols)
      .select(gcols ++ Seq(col("digit"), col("n_d"), col("n").cast("long").as("n"),
        round(col("n_d").cast("double") / col("n"), 6).as("share"),
        round(expected, 6).as("expected"), col("chi2")): _*)
  }

  /** Column-level dataset profile in long format: per listed column,
    * row count, null count, exact distinct count, and min/max rendered
    * as strings — the governance companion to the per-source datasheet
    * (q144 profiles the CORPUS by source; this profiles a TABLE by
    * column: the "is this column populated / keyed / in range" check a
    * release review starts with).
    *
    * Scale shape: one aggregation per column over a column-PRUNED scan
    * (the parquet reader materializes exactly that column), so the
    * whole profile costs Σ column sizes ≈ one full-table scan split
    * into |cols| parallel single-column passes; each pass is a global
    * agg whose only wide term is the exact count(DISTINCT) shuffle of
    * that column's values (the profiler's point — swap
    * `approx_count_distinct` in via `exact = false` when a 2% answer
    * is enough at 100 TB).
    */
  /** Grouped least-squares trend over integer (x, y) points: per group,
    * n, slope, intercept, and r² — the "is this series growing,
    * collapsing, or noise" screen over per-day counts (ingest-volume
    * monitoring, source-health dashboards). Closed-form OLS on
    * integer-exact sums: Σx, Σy, Σxy, Σx², Σy² accumulate as longs
    * (exact — no float-summation order sensitivity enters before the
    * final division), so the oracle algebra is bit-stable. Degenerate
    * groups (single point, or zero x-variance) yield NULL
    * slope/intercept/r², never a division blow-up.
    *
    * Scale shape: one (group) hash agg with map-side combine over the
    * point relation; everything after it is per-group scalar algebra.
    */
  def groupedTrend(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedTrend needs >= 1 group column")
    val gcols = groupCols.map(col)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val sums = df.groupBy(gcols: _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val dxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val dxy = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val slope = when(dxx =!= 0.0, dxy / dxx)
    val intercept = when(dxx =!= 0.0,
      (col("sy").cast("double") - (dxy / dxx) * col("sx").cast("double"))
        / col("n").cast("double"))
    val r2 = when(dxx =!= 0.0 && dyy =!= 0.0, dxy * dxy / (dxx * dyy))
    sums.select(gcols ++ Seq(col("n"),
      round(slope, 6).as("slope"),
      round(intercept, 6).as("intercept"),
      round(r2, 6).as("r2")): _*)
  }

  def columnProfile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs >= 1 column")
    cols.map { c =>
      val nd = if (exact) countDistinct(col(c))
        else approx_count_distinct(col(c))
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(col(c).isNull.cast("long")).as("n_null"),
        nd.as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)
  }

  /** Exclusive cumulative Poisson(1) probabilities: `PoissonCdf(k)` =
    * P(X ≤ k−1), so a uniform u draws `k = #{t ∈ cdf : u ≥ t}`.
    * Truncated at 8 (P(X > 8) ≈ 1.1e-6 — a documented, negligible
    * resampling bias). Shared between the engine expression and
    * generated oracle SQL so the literals can never drift.
    */
  val PoissonCdf: Seq[Double] = {
    val pdf = (0 to 7).scanLeft(math.exp(-1.0)) { (p, k) => p / (k + 1) }
    pdf.init.scanLeft(0.0)(_ + _).tail
  }

  /** Paired bootstrap significance test (Poisson-bootstrap form —
    * Chamandy et al. 2012's scale trick: instead of materializing B
    * index-resamples and joining them back, each (item, replicate)
    * pair draws a DETERMINISTIC Poisson(1) weight from
    * [[Sampling.seededMix]], which approximates multinomial
    * resampling with a purely MAP-SIDE plan — the corpus explodes to
    * B weighted rows per item in situ and partial-aggregates per
    * replicate before any exchange, so the shuffle carries
    * B × tasks partial rows, never B × n draws, and there is no join
    * at all).
    *
    * Input: one row per paired item (a query, a user…) with the two
    * systems' scores. Output: ONE row —
    * `n_items, n_boot, mean_delta, p_le_zero, ci_lo, ci_hi` where
    * `mean_delta` = observed mean(a − b), `p_le_zero` is the add-one
    * one-sided bootstrap p for "A beats B"
    * (`(1 + #{replicate mean ≤ 0}) / (B + 1)`), and the CI bounds are
    * the exact ceil(0.025·B)/ceil(0.975·B) order statistics of the B
    * replicate means (rank selection over [[Sampling.prefixSumBy]] —
    * integer rank logic, no floating quantile conventions).
    *
    * Cross-engine reproducibility contract: with INTEGER-valued
    * scores (hits@k, success flags, counts) every replicate mean is an
    * exact integer ratio, so the p-value and CI replay bit-for-bit in
    * a SQL oracle; with continuous scores the test is correct but the
    * oracle guarantee drops to the usual FP-sum caveat. A replicate
    * whose total weight is 0 contributes mean 0 (probability e^(−n) —
    * unreachable past toy n).
    */
  def pairedBootstrap(
      df: DataFrame,
      idCol: String,
      aCol: String,
      bCol: String,
      nBoot: Int = 1000,
      seed: Long = 42L): DataFrame = {
    require(nBoot >= 40, s"nBoot=$nBoot too small for 2.5%/97.5% bounds")
    // Replicate streams are seeded off a LONG item id. Numeric ids cast
    // directly (the SQL-replayable contract the generated oracle
    // interpolates); any other id type is hashed via xxhash64 — still a
    // valid deterministic bootstrap, just suite-gated rather than
    // oracle-replayable (DuckDB has no xxhash64). A NULL id would make
    // u NULL and every Poisson weight 0 while the item still counted in
    // n_items — a silent bias — so NULL ids fail the job instead.
    val idIsNumeric = df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val idLong = if (idIsNumeric) col(idCol).cast("long")
                 else xxhash64(col(idCol))
    val base = df.select(
      when(col(idCol).isNotNull, idLong)
        .otherwise(raise_error(lit(
          s"pairedBootstrap: NULL $idCol — every paired item needs a deterministic replicate stream")))
        .as("_pb_id"),
      (col(aCol).cast("double") - col(bCol).cast("double")).as("_pb_d"))
    // one (item, replicate) row per pair, Poisson(1) weight from the
    // seeded mix of (id, b) — u exact in double (power-of-two scale).
    // The id pre-reduces mod 2^31 BEFORE the combine so the combined
    // key never exceeds 2^31·B — Spark longs would wrap silently but
    // DuckDB BIGINT overflow throws, and the oracle must replay this
    val u = (Sampling.seededMix(
      pmod(col("_pb_id"), lit(2147483648L)) * lit(nBoot.toLong)
        + col("_pb_b"), seed)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val w = PoissonCdf.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val means = base
      .select(col("_pb_d"),
        explode(sequence(lit(0L), lit(nBoot.toLong - 1))).as("_pb_b"),
        col("_pb_id"))
      .withColumn("_pb_w", w)
      .groupBy("_pb_b")
      .agg((sum(col("_pb_w") * col("_pb_d"))
        / greatest(sum(col("_pb_w")), lit(1L))).as("_pb_mean"))
    // exact order statistics of the B means: rank selection over the
    // two-phase prefix sum (ties broken by replicate id — the key is
    // unique, so selection is deterministic)
    val kLo = math.ceil(0.025 * nBoot).toLong
    val kHi = math.ceil(0.975 * nBoot).toLong
    val ranked = Sampling.prefixSumBy(
      means.withColumn("_pb_key", struct(col("_pb_mean"), col("_pb_b")))
        .withColumn("_pb_one", lit(1L)),
      Nil, "_pb_key", "_pb_one")
    def atRank(k: Long) = ranked.filter(col("cum_sum") === k - 1)
      .select(col("_pb_mean"))
    val summary = means.agg(
      (sum(when(col("_pb_mean") <= 0.0, 1L).otherwise(0L)) + 1L)
        .cast("double").as("_pb_ple"))
    val observed = base.agg(
      count(lit(1)).as("n_items"),
      (sum(col("_pb_d")) / count(lit(1))).as("_pb_obs"))
    observed
      .crossJoin(summary)                      // 1 × 1 rows
      .crossJoin(atRank(kLo).withColumnRenamed("_pb_mean", "_pb_lo"))
      .crossJoin(atRank(kHi).withColumnRenamed("_pb_mean", "_pb_hi"))
      .select(col("n_items"), lit(nBoot).cast("long").as("n_boot"),
        round(col("_pb_obs"), 6).as("mean_delta"),
        round(col("_pb_ple") / lit((nBoot + 1).toDouble), 6).as("p_le_zero"),
        round(col("_pb_lo"), 6).as("ci_lo"),
        round(col("_pb_hi"), 6).as("ci_hi"))
  }

  /** One-sided CUSUM change detection over a per-group time series
    * (Page 1954) — the volume-monitoring alarm: a sustained upward
    * shift in daily counts accumulates while transient spikes decay.
    * Computed via the CLOSED FORM `C_i = D_i − min_{j≤i} D_j` with
    * `D_i = S_i − k·i` (S = prefix sum of x, i = 1-based position,
    * k = the per-group reference mean + `allowance·σ`, both from
    * integer-exact power sums) — the max(0, C_{i−1} + x_i − k)
    * recurrence without the sequential dependency, so it replays in a
    * SQL oracle as prefix sums + a running min.
    *
    * Scale shape: the input is already a (group, t, x) TIME-BUCKET
    * relation (days, hours — bounded by the time range, not the
    * corpus); the windows here run per group over those bucket rows —
    * the isotonic/bucket-relation precedent, NEVER over raw events.
    * Output: every input row + `cusum` and `alarm` (cusum > h·σ).
    */
  def cusumByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      tCol: String,
      valueCol: String,
      allowance: Double = 0.5,
      h: Double = 4.0,
      roundTo: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "cusumByGroup needs >= 1 group column")
    val gcols = groupCols.map(col)
    val x = col(valueCol).cast("double")
    val stats = df.groupBy(gcols: _*).agg(
      count(lit(1)).as("_cs_n"), sum(x).as("_cs_sx"),
      sum(x * x).as("_cs_sxx"))
    val n = col("_cs_n").cast("double")
    val mean = col("_cs_sx") / n
    val sd = sqrt((col("_cs_sxx") - col("_cs_sx") * col("_cs_sx") / n) / n)
    val params = stats.select(gcols :+ (mean + lit(allowance) * sd)
      .as("_cs_k") :+ (lit(h) * sd).as("_cs_h"): _*)
    import org.apache.spark.sql.expressions.Window
    val wRow = Window.partitionBy(gcols: _*).orderBy(col(tCol))
    val wRun = wRow.rowsBetween(Window.unboundedPreceding, 0)
    val d = df.join(params, groupCols)
      .withColumn("_cs_i",
        org.apache.spark.sql.functions.row_number().over(wRow))
      .withColumn("_cs_s", sum(x).over(wRun))
      .withColumn("_cs_d", col("_cs_s") - col("_cs_k") * col("_cs_i"))
      .withColumn("_cs_min", min(col("_cs_d")).over(wRun))
      // C_i = D_i − min_{0≤j≤i} D_j with D_0 = 0 folded in as the zero
      // term of the least — equals the max(0, C_{i−1} + x_i − k)
      // recurrence by induction, and is ≥ 0 by construction
      .withColumn("cusum",
        col("_cs_d") - least(lit(0.0), col("_cs_min")))
    d.select(df.columns.map(col) :+
        round(col("cusum"), roundTo).as("cusum") :+
        (col("cusum") > col("_cs_h")).as("alarm"): _*)
  }

  /** Seasonal-naive forecast evaluation (the Hyndman & Koehler 2006
    * MASE convention): forecast `x_t = x_{t−season}`, scaled by the
    * one-step naive error on the same evaluable rows — MASE < 1 means
    * the seasonal pattern beats a random walk. Lags are EQUI-JOINS on
    * the shifted time key (never a window over raw rows); with
    * integer-valued series both MAEs are ratios of exact sums, so the
    * relation replays in SQL. Output per group:
    * `n_eval, mae_seasonal, mae_naive1, mase` (NULL when the naive
    * error is 0 — a constant series has no scale).
    */
  def seasonalNaiveEval(
      df: DataFrame,
      groupCols: Seq[String],
      tCol: String,
      valueCol: String,
      season: Int,
      roundTo: Int = 6): DataFrame = {
    require(season >= 2, s"season=$season must be >= 2 (1 IS the naive scale)")
    val base = df.select(groupCols.map(col) :+ col(tCol).cast("long")
      .as("_sn_t") :+ col(valueCol).cast("double").as("_sn_x"): _*)
    def lagged(by: Int, as: String) = base.select(
      groupCols.map(col) :+ (col("_sn_t") + by).as("_sn_t") :+
        col("_sn_x").as(as): _*)
    val joined = base
      .join(lagged(season, "_sn_xs"), groupCols :+ "_sn_t")
      .join(lagged(1, "_sn_x1"), groupCols :+ "_sn_t")
    val agg = joined.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_eval"),
      sum(abs(col("_sn_x") - col("_sn_xs"))).as("_sn_es"),
      sum(abs(col("_sn_x") - col("_sn_x1"))).as("_sn_e1"))
    agg.select(groupCols.map(col) :+ col("n_eval") :+
      round(col("_sn_es") / col("n_eval"), roundTo).as("mae_seasonal") :+
      round(col("_sn_e1") / col("n_eval"), roundTo).as("mae_naive1") :+
      round(when(col("_sn_e1") > 0.0,
        (col("_sn_es") / col("n_eval")) / (col("_sn_e1") / col("n_eval")))
        , roundTo).as("mase"): _*)
  }

  /** Generated DuckDB oracle for [[pairedBootstrap]] — the
    * next-to-the-operator oracle-builder pattern
    * ([[GraphOps.pageRankOracleSql]]): `pairsSql` must select
    * `id, a, b`; the replay shares [[PoissonCdf]]'s literals and
    * [[Sampling.seededMix]]'s constants with the engine, so the two
    * sides cannot drift. Sound bit-for-bit for INTEGER-valued scores
    * (see the operator's contract).
    */
  def pairedBootstrapOracleSql(
      pairsSql: String,
      nBoot: Int = 1000,
      seed: Long = 42L): String = {
    val kLo = math.ceil(0.025 * nBoot).toLong
    val kHi = math.ceil(0.975 * nBoot).toLong
    val wCase = PoissonCdf
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH pairs AS ($pairsSql),
       |d AS (SELECT id, CAST(a AS DOUBLE) - CAST(b AS DOUBLE) AS dlt
       |      FROM pairs),
       |draws AS (SELECT d.dlt, br.b,
       |    (CAST((((((id % 2147483648) + 2147483648) % 2147483648)
       |        * $nBoot + br.b) % 2147483648 + 2147483648) % 2147483648
       |        AS BIGINT) * 2654435761 + $seed) % 4294967296 AS mix
       |  FROM d CROSS JOIN range(0, $nBoot) br(b)),
       |wtd AS (SELECT dlt, b,
       |    $wCase AS w
       |  FROM (SELECT dlt, b, (mix + 0.5) / 4294967296.0 AS u FROM draws)),
       |means AS (SELECT b, sum(w * dlt) / greatest(sum(w), 1) AS m
       |          FROM wtd GROUP BY b),
       |ranked AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn
       |           FROM means)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_items,
       |  CAST($nBoot AS BIGINT) AS n_boot,
       |  (SELECT ROUND(sum(dlt) / count(*), 6) FROM d) AS mean_delta,
       |  (SELECT ROUND((sum(CASE WHEN m <= 0.0 THEN 1 ELSE 0 END) + 1)
       |     / ${nBoot + 1}.0, 6) FROM means) AS p_le_zero,
       |  (SELECT ROUND(m, 6) FROM ranked WHERE rn = $kLo) AS ci_lo,
       |  (SELECT ROUND(m, 6) FROM ranked WHERE rn = $kHi) AS ci_hi""".stripMargin
  }
}
