package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join — the batch primitive Spark plans as a
  * broadcast-nested-loop (or worse, a cartesian) when written as a raw
  * `|a.ts − b.ts| <= tol` condition: both sides are binned into
  * `tolerance`-wide buckets, the left side is replicated to its three
  * adjacent bins (any in-range pair's bins differ by at most one, and a
  * right row lives in exactly one bin — so every qualifying pair meets
  * exactly once), the join runs as an ordinary co-partitioned equi-join
  * on `(keys…, bin)`, and the exact predicate filters the candidates.
  *
  * Scale shape: one 3× exchange of the left, one 1× exchange of the
  * right, and per-(key, bin) candidate work bounded by the bin density
  * — the standard range-join binning optimization, expressed with
  * nothing but relational operators so Catalyst/AQE still see an
  * equi-join (a hot (key, bin) splits under AQE skew handling like any
  * other shuffle partition; PlanSpec pins the no-nested-loop shape).
  *
  * `leftTs`/`rightTs` must be NUMERIC columns (cast timestamps with
  * `.cast("long")` — epoch seconds — first); magnitudes must stay under
  * 2^53 so the bin's floor-division is exact. Right-side column names
  * (beyond the join keys) must not collide with left's — rename before
  * joining, as with any Spark equi-join.
  */
object RangeJoin {

  def byBucket(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Long): DataFrame = {
    require(tolerance >= 1, s"tolerance=$tolerance must be >= 1")
    val collisions = right.columns.toSet
      .diff(keyCols.toSet)
      .intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"byBucket: right-side columns ${collisions.mkString(", ")} collide with " +
        "the left side — rename before joining")
    // the temp bin columns would silently overwrite (and then drop)
    // same-named user columns via withColumn — refuse, don't eat data
    val reserved = Set("_rj_b", "_rj_bin")
    val reservedHits =
      (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(reservedHits.isEmpty,
      s"byBucket: input columns ${reservedHits.mkString(", ")} collide with " +
        "the reserved internal names _rj_b/_rj_bin — rename before joining")
    def bin(c: Column): Column =
      floor(c.cast("double") / lit(tolerance.toDouble)).cast("long")
    val l = left
      .withColumn("_rj_b", bin(col(leftTs)))
      .withColumn("_rj_bin",
        explode(array(col("_rj_b") - 1, col("_rj_b"), col("_rj_b") + 1)))
      .drop("_rj_b")
    val r = right.withColumn("_rj_bin", bin(col(rightTs)))
    l.join(r, keyCols :+ "_rj_bin")
      .filter(abs(col(leftTs) - col(rightTs)) <= tolerance)
      .drop("_rj_bin")
  }
}
