package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment / A-B analytics: the read-out layer an event pipeline
  * feeds — variance-reduced effect estimates (CUPED), assignment
  * sanity (sample-ratio mismatch), robust means. Complements
  * [[Stats.pairedBootstrap]] (which answers "is the delta
  * significant"): CUPED shrinks the variance BEFORE the test, SRM
  * catches the broken randomization that invalidates both.
  *
  * Determinism contract shared with the rest of the oracle surface:
  * every statistic here is a CLOSED FORM over integer-exact power
  * sums (Σx, Σy, Σxy, Σx², counts) — sums of integer-valued doubles
  * associate exactly, so the derived doubles replay bit-for-bit in a
  * SQL oracle regardless of partitioning. Nothing iterates; one
  * map-side-combined aggregation per relation.
  */
object Experiment {

  /** CUPED (Controlled-experiment Using Pre-Experiment Data — Deng,
    * Xu, Kohavi & Walker, WSDM 2013): per unit, the adjusted metric
    * `y − θ·(x − x̄)` where `x` is a pre-experiment covariate,
    * `θ = cov(x, y)/var(x)` is fit ONCE on the pooled population and
    * `x̄` is the pooled covariate mean — unbiased for the treatment
    * effect (assignment is independent of pre-period behavior) with
    * variance shrunk by the covariate's explanatory share (1 − ρ²).
    *
    * Output: one row per arm —
    * `armCol, n, mean_raw, mean_adj, theta, var_raw, var_adj,
    * var_reduction` (the last four are pooled-population values,
    * repeated per row so the relation stays flat). Variances come from
    * the closed form `var(y − θx) = var(y) − 2θ·cov + θ²·var(x)` over
    * the same exact sums — never a second pass over adjusted doubles,
    * whose summation order would be partition-dependent. Population
    * variances (÷n); `theta`/`var_*` NULL when var(x) = 0 or n < 2
    * (no covariate signal to regress out).
    */
  def cuped(
      df: DataFrame,
      armCol: String,
      metricCol: String,
      covariateCol: String,
      roundTo: Int = 6): DataFrame = {
    val y = col(metricCol).cast("double")
    val x = col(covariateCol).cast("double")
    val pooled = df.agg(
      count(lit(1)).as("_cu_n"),
      sum(x).as("_cu_sx"), sum(y).as("_cu_sy"),
      sum(x * y).as("_cu_sxy"),
      sum(x * x).as("_cu_sxx"), sum(y * y).as("_cu_syy"))
    val n = col("_cu_n").cast("double")
    val varX = (col("_cu_sxx") - col("_cu_sx") * col("_cu_sx") / n) / n
    val varY = (col("_cu_syy") - col("_cu_sy") * col("_cu_sy") / n) / n
    val covXY = (col("_cu_sxy") - col("_cu_sx") * col("_cu_sy") / n) / n
    val stats = pooled.select(
      when(col("_cu_n") >= 2 && varX > 0.0, covXY / varX).as("_cu_theta"),
      (col("_cu_sx") / n).as("_cu_xbar"),
      varY.as("_cu_vraw"),
      when(col("_cu_n") >= 2 && varX > 0.0,
        varY - covXY * covXY / varX).as("_cu_vadj"))
    val arms = df.groupBy(col(armCol))
      .agg(count(lit(1)).as("n"),
        sum(y).as("_cu_asy"), sum(x).as("_cu_asx"))
    arms.crossJoin(stats) // 1-row broadcast scalar
      .select(col(armCol), col("n"),
        round(col("_cu_asy") / col("n"), roundTo).as("mean_raw"),
        round(col("_cu_asy") / col("n")
          - col("_cu_theta") * (col("_cu_asx") / col("n") - col("_cu_xbar")),
          roundTo).as("mean_adj"),
        round(col("_cu_theta"), roundTo).as("theta"),
        round(col("_cu_vraw"), roundTo).as("var_raw"),
        round(col("_cu_vadj"), roundTo).as("var_adj"),
        round(lit(1.0) - col("_cu_vadj") / col("_cu_vraw"), roundTo)
          .as("var_reduction"))
  }

  /** Sample-ratio-mismatch check: Pearson χ² of observed arm counts
    * against the design ratios (weights need not be normalized). A big
    * χ² at k−1 degrees of freedom means the assignment itself broke —
    * every downstream readout is suspect. Output: one row per arm
    * (`armCol, n_obs, n_expected, chi2_term`) plus the flat total
    * (`chi2`, `df`) repeated per row. Arms in `ratios` that never
    * appear get an explicit 0-count row; observed arms missing from
    * `ratios` fail fast — an unknown arm IS the mismatch.
    */
  def srmCheck(
      df: DataFrame,
      armCol: String,
      ratios: Map[String, Double],
      roundTo: Int = 6): DataFrame = {
    require(ratios.nonEmpty && ratios.values.forall(_ > 0),
      "srmCheck: ratios must be non-empty and positive")
    val spark = df.sparkSession
    val wTotal = ratios.values.sum
    val counts = df.groupBy(col(armCol)).agg(count(lit(1)).as("n_obs"))
    val unknown = counts.select(col(armCol))
      .filter(!col(armCol).isin(ratios.keys.toSeq: _*))
      .limit(1).collect()
    require(unknown.isEmpty,
      s"srmCheck: arm '${unknown.headOption.map(_.get(0)).orNull}' not in the design ratios")
    import spark.implicits._
    val design = ratios.toSeq.toDF(armCol, "_srm_w")
    val joined = design.join(counts, Seq(armCol), "left")
      .select(col(armCol), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("_srm_w"))
    val total = joined.agg(sum("n_obs").as("_srm_n"))
    val terms = joined.crossJoin(total) // 1-row scalar
      .withColumn("_srm_e", col("_srm_n") * col("_srm_w") / lit(wTotal))
      .withColumn("_srm_t",
        (col("n_obs") - col("_srm_e")) * (col("n_obs") - col("_srm_e"))
          / col("_srm_e"))
    val chi2 = terms.agg(sum("_srm_t").as("_srm_chi2"))
    terms.crossJoin(chi2)
      .select(col(armCol), col("n_obs"),
        round(col("_srm_e"), roundTo).as("n_expected"),
        round(col("_srm_t"), roundTo).as("chi2_term"),
        round(col("_srm_chi2"), roundTo).as("chi2"),
        lit(ratios.size - 1L).as("df"))
  }

  /** Ratio-metric readout with delta-method uncertainty (the classic
    * experimentation trap: "revenue per session" is a ratio of two
    * unit-level sums, Σy/Σx, and its variance is NOT var(y/x) — the
    * unit is the randomization unit, sessions cluster within it;
    * Deng et al. 2017's delta method gives
    * `var(r) ≈ (var(y) − 2r·cov(x,y) + r²·var(x)) / (n·x̄²)`).
    *
    * Output: one row per arm — `armCol, n, sum_num, sum_den, ratio,
    * se` — plus, when exactly two arms are present, the pairwise
    * z-statistic of the ratio difference repeated per row (`z`, NULL
    * for ≠ 2 arms; the caller turns it into a p-value at their chosen
    * test). Every moment is an integer-exact power sum per arm, so
    * the relation replays in a SQL oracle; SE is NULL for degenerate
    * arms (n < 2 or x̄ = 0).
    */
  def ratioMetric(
      df: DataFrame,
      armCol: String,
      numCol: String,
      denCol: String,
      roundTo: Int = 6): DataFrame = {
    val y = col(numCol).cast("double")
    val x = col(denCol).cast("double")
    val arms = df.groupBy(col(armCol)).agg(
      count(lit(1)).as("n"),
      sum(y).as("_rm_sy"), sum(x).as("_rm_sx"),
      sum(y * y).as("_rm_syy"), sum(x * x).as("_rm_sxx"),
      sum(x * y).as("_rm_sxy"))
    val n = col("n").cast("double")
    val xbar = col("_rm_sx") / n
    val r = col("_rm_sy") / col("_rm_sx")
    val varY = (col("_rm_syy") - col("_rm_sy") * col("_rm_sy") / n) / n
    val varX = (col("_rm_sxx") - col("_rm_sx") * col("_rm_sx") / n) / n
    val covXY = (col("_rm_sxy") - col("_rm_sx") * col("_rm_sy") / n) / n
    val varR = (varY - lit(2.0) * r * covXY + r * r * varX) /
      (n * xbar * xbar)
    val per = arms.select(col(armCol), col("n"),
      col("_rm_sy").as("sum_num"), col("_rm_sx").as("sum_den"),
      when(col("_rm_sx") =!= 0.0, r).as("_rm_r"),
      when(col("n") >= 2 && col("_rm_sx") =!= 0.0, varR).as("_rm_var"))
    // pairwise z only when the experiment has exactly two arms: the
    // arms relation is arm-scale, so this is a 2-row self-join
    val z2 = per.select(col(armCol).as("_rm_a"), col("_rm_r").as("_rm_ra"),
        col("_rm_var").as("_rm_va"))
      .crossJoin(per.select(col(armCol).as("_rm_b"),
        col("_rm_r").as("_rm_rb"), col("_rm_var").as("_rm_vb")))
      .filter(col("_rm_a") < col("_rm_b"))
      .agg(count(lit(1)).as("_rm_npairs"),
        first(abs(col("_rm_ra") - col("_rm_rb"))
          / sqrt(col("_rm_va") + col("_rm_vb"))).as("_rm_z"))
      .select(when(col("_rm_npairs") === 1, col("_rm_z")).as("_rm_z"))
    per.crossJoin(z2) // 1-row scalar
      .select(col(armCol), col("n"), round(col("sum_num"), roundTo)
        .as("sum_num"),
        round(col("sum_den"), roundTo).as("sum_den"),
        round(col("_rm_r"), roundTo).as("ratio"),
        round(sqrt(col("_rm_var")), roundTo).as("se"),
        round(col("_rm_z"), roundTo).as("z"))
  }

  /** Per-group trimmed mean: drop the `trimNum/trimDen` bottom AND top
    * mass by rank (`t = ceil(n·trimNum/trimDen)` rows each side,
    * integer arithmetic) and average the middle. Robust to the heavy
    * tails that make raw experiment means jumpy.
    *
    * Scale shape: the corpus collapses to the (group, value) histogram
    * (map-side combined, value-cardinality-bound like
    * [[Stats.exactQuantilesByGroup]] — intended for integer-ish
    * metrics; continuous domains should bucket first), then
    * [[Sampling.prefixSumBy]] ranks the histogram two-phase and each
    * value row contributes `value × |[c, c+cnt) ∩ [t, n−t)|` — an
    * exact integer overlap, so the trimmed sum is integer-exact for
    * integer values and the mean replays in SQL. Groups with no
    * surviving mass (`n ≤ 2t`) return NULL.
    */
  def trimmedMeanByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      trimNum: Int = 1,
      trimDen: Int = 20,
      roundTo: Int = 6,
      nShards: Int = 32): DataFrame = {
    require(groupCols.nonEmpty, "trimmedMeanByGroup needs >= 1 group column")
    require(trimNum >= 0 && trimDen >= 1 && 2L * trimNum < trimDen,
      s"trim=$trimNum/$trimDen must satisfy 0 <= 2·trim < 1")
    val gcols = groupCols.map(col)
    val hist = df.groupBy(gcols :+ col(valueCol).cast("double").as("_tm_v"): _*)
      .agg(count(lit(1)).as("_tm_c"))
    val ranked = Sampling.prefixSumBy(hist, groupCols, "_tm_v", "_tm_c",
      nShards)
    val ns = hist.groupBy(gcols: _*).agg(sum("_tm_c").as("_tm_n"))
    // t = ceil(n·num/den) via exact floor division on longs
    val a = col("_tm_n") * lit(trimNum.toLong) + lit(trimDen.toLong - 1)
    val t = ((a - pmod(a, lit(trimDen.toLong))) / lit(trimDen.toLong))
      .cast("long")
    val lo = t
    val hi = col("_tm_n") - t
    // overlap of this value's rank span [cum, cum+c) with [lo, hi)
    val begin = greatest(col("cum_sum"), lo)
    val end = least(col("cum_sum") + col("_tm_c"), hi)
    val contrib = greatest(end - begin, lit(0L))
    ranked.join(ns, groupCols)
      .groupBy(gcols: _*)
      .agg(first(col("_tm_n")).as("n_rows"),
        first(hi - lo).as("n_kept"),
        round(sum(col("_tm_v") * contrib)
          / when(first(hi - lo) > 0, first(hi - lo)), roundTo)
          .as("trimmed_mean"))
  }
}
