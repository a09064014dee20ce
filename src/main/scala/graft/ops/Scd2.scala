package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) construction from a change
  * stream: given per-key change events `(key*, value, ts, seq)`, emit
  * one VERSION row per run of consecutive equal values, carrying its
  * validity interval `[valid_from, valid_to)` — `valid_to` null for the
  * open current version. The warehouse-side twin of the reference's
  * day-partitioned snapshot ETL (SURVEY §2.9): where the reference
  * rebuilds each day's slice whole, this derives the versioned
  * dimension a point-in-time join needs (`AS OF` lookups land on the
  * interval via [[RangeJoin]]/interval-join semantics).
  *
  * Consecutive duplicates collapse (an event restating the current
  * value opens no new version — the CDC echo case); value comparison is
  * null-safe, so null→X and X→null transitions version correctly.
  * `seqCol` breaks same-timestamp ties deterministically (the caller
  * supplies a unique sequence — an offset, an event id).
  *
  * Scale shape: ONE exchange. The run detection (lag), run numbering
  * (running sum), per-run fold (groupBy key+version), and the
  * valid_to lead all cluster by the SAME key columns, so Catalyst
  * plans a single hash exchange on the keys followed by sorts —
  * per-key history lives in one partition exactly once. Skew bound:
  * a key's history must fit a partition's sort spill budget, the
  * standard SCD contract (histories are bounded by change counts,
  * not corpus size).
  */
object Scd2 {

  def fromChanges(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      tsCol: String,
      seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "Scd2.fromChanges: at least one key column")
    val reserved = Set("_scd_prev", "_scd_start", "version",
      "valid_from", "valid_to", "is_current")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"Scd2.fromChanges: input columns ${clash.mkString(", ")} collide with " +
        "the reserved internal/output names — rename before merging")
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(col(tsCol), col(seqCol))
    val runs = df
      .withColumn("_scd_prev", lag(col(valueCol), 1).over(w))
      // null-safe: the FIRST event (prev undefined) always starts a run,
      // distinguished from a genuine null value via a separate flag
      .withColumn("_scd_start",
        (row_number().over(w) === 1 ||
          !(col(valueCol) <=> col("_scd_prev"))).cast("long"))
      .withColumn("version",
        sum(col("_scd_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val folded = runs
      .groupBy(key :+ col("version"): _*)
      .agg(
        first(col(valueCol)).as(valueCol),
        min(col(tsCol)).as("valid_from"))
    val wv = Window.partitionBy(key: _*).orderBy(col("version"))
    folded
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time join: attach to each fact row the dimension version
    * whose validity interval contains the fact's timestamp. Because
    * [[fromChanges]] emits CONTIGUOUS intervals per key (each
    * `valid_to` is the next `valid_from`), interval containment is
    * equivalent to an as-of join on `valid_from` — most recent version
    * start ≤ fact ts — so this delegates to [[AsOfJoin.asOf]] (one key
    * exchange + one sort, never an interval theta join). Zero-width
    * versions (two changes at the same timestamp) lose the as-of tie
    * to the later version via the `version` tiebreak, exactly matching
    * the containment semantics (nothing lives in `[t, t)`). Facts
    * before the key's first version, or with no key match, keep NULL
    * version columns — the left-join contract.
    *
    * @param facts     fact rows (all kept)
    * @param dim       a [[fromChanges]] output (needs `valid_from`,
    *                  `version`, the key columns, and `valueCols`)
    * @param keyCols   equality keys present on both sides
    * @param factTs    event-time column on the facts
    * @param valueCols dimension columns to attach (e.g. the value and
    *                  `version`)
    */
  def pointInTime(
      facts: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      factTs: String,
      valueCols: Seq[String]): DataFrame =
    AsOfJoin.asOf(facts, dim, keyCols, factTs, "valid_from",
      valueCols, tiebreakCols = Seq("version"))
}
