package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * release-over-release health check that catches a filter change or
  * upstream shift moving the data before it moves the model.
  */
object Drift {

  /** Population Stability Index report over a numeric column, bucketed
    * at fixed width: one row per bucket present in EITHER snapshot with
    * both counts, both shares, and the bucket's PSI contribution
    * `(p − q)·ln(p/q)` (shares floored at `eps` so one-sided buckets
    * contribute a large-but-finite term — the standard smoothing; PSI
    * itself is Σ contrib, derivable from the relation). Fixed-width
    * `floor(value/binWidth)` buckets rather than quantile edges keep
    * the report deterministic and engine-replayable — drift of the
    * EDGES is exactly what quantile binning would hide.
    *
    * Folk thresholds (credit-scoring lineage): < 0.1 stable, 0.1–0.25
    * watch, > 0.25 shifted.
    *
    * Scale shape: one map-side-combined bucket count per snapshot
    * (bucket cardinality = value range / binWidth, vocabulary-bound),
    * a bucket-keyed full-outer join of the two tiny histograms, then
    * map-only share/contrib arithmetic — corpus rows are touched
    * exactly once per side.
    */
  def psiReport(
      old: DataFrame,
      neu: DataFrame,
      valueCol: String,
      binWidth: Double,
      eps: Double = 1e-6): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be > 0")
    require(eps > 0 && eps < 1, s"eps=$eps must be in (0, 1)")
    def hist(df: DataFrame, cnt: String): DataFrame = df
      .select(floor(col(valueCol).cast("double") / lit(binWidth))
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(cnt))
    val o = hist(old, "n_old")
    val n = hist(neu, "n_new")
    val totO = o.agg(sum("n_old").as("t_old"))
    val totN = n.agg(sum("n_new").as("t_new"))
    def share(c: Column, t: Column): Column =
      greatest(c.cast("double") / t.cast("double"), lit(eps))
    o.join(n, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
      .crossJoin(broadcast(totO)).crossJoin(broadcast(totN))
      .select(col("bucket"),
        col("n_old").cast("long").as("n_old"),
        col("n_new").cast("long").as("n_new"),
        round(share(col("n_old"), col("t_old")), 6).as("p_old"),
        round(share(col("n_new"), col("t_new")), 6).as("p_new"),
        round((share(col("n_old"), col("t_old")) - share(col("n_new"), col("t_new")))
            * log(share(col("n_old"), col("t_old")) / share(col("n_new"), col("t_new"))),
          6).as("psi_contrib"))
  }
}
