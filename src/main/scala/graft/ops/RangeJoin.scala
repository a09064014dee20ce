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

  /** Bucketed INTERVAL-overlap join: pairs where the closed intervals
    * `[lStart, lEnd]` and `[rStart, rEnd]` intersect (`lStart <= rEnd
    * AND rStart <= lEnd`), optionally under equality keys — the
    * sessions×windows / spans×spans primitive Spark would otherwise
    * plan as a nested loop.
    *
    * Both sides explode to the `bucketWidth`-wide bins their interval
    * covers and meet on an ordinary co-partitioned equi-join on
    * `(keys…, bin)`: any intersecting pair shares every bin containing
    * an intersection point, so candidates meet; the exact predicate
    * then filters. Duplicate meetings (a pair sharing several bins) are
    * eliminated WITHOUT a distinct shuffle by emitting a pair only from
    * the first intersection bin — the bin of `max(lStart, rStart)`,
    * which lies in both cover sets exactly once.
    *
    * Scale shape: each side is exchanged once at its bin multiplicity
    * (spans/bucketWidth + 1 replicas per row); per-bin candidate work
    * is bin-density-bounded, and the equi-join stays visible to
    * Catalyst/AQE (skewed bins split like any shuffle partition; no
    * nested loop — PlanSpec pins it). Choose `bucketWidth` at or above
    * the typical span so replication stays O(1) per row; a row spanning
    * more than `maxBucketsPerRow` bins fails fast with `raise_error`
    * instead of silently exploding the shuffle (an unbounded interval —
    * a data bug — would otherwise materialize millions of replicas).
    *
    * Bounds columns must be NUMERIC (cast timestamps to epoch seconds
    * first), magnitudes under 2^53, and each interval non-empty
    * (`start <= end` — enforced with `raise_error`, not silently
    * dropped). Right-side non-key names must not collide with left's.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long,
      maxBucketsPerRow: Int = 4096): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    val collisions = right.columns.toSet
      .diff(keyCols.toSet)
      .intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"intervalOverlap: right-side columns ${collisions.mkString(", ")} collide " +
        "with the left side — rename before joining")
    val reserved = Set("_rj_bin")
    val reservedHits =
      (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(reservedHits.isEmpty,
      s"intervalOverlap: input columns ${reservedHits.mkString(", ")} collide " +
        "with the reserved internal name _rj_bin — rename before joining")
    def bin(c: Column): Column =
      floor(c.cast("double") / lit(bucketWidth.toDouble)).cast("long")
    def cover(df: DataFrame, s: String, e: String): DataFrame = {
      val lo = bin(col(s))
      val hi = bin(col(e))
      val guarded = when(col(s) > col(e),
          expr(s"raise_error(concat('intervalOverlap: empty interval ', $s, ' > ', $e))"))
        .when(hi - lo + 1 > maxBucketsPerRow,
          expr(s"raise_error(concat('intervalOverlap: interval spans more than " +
            s"$maxBucketsPerRow buckets of width $bucketWidth: ', $s, '..', $e))"))
        .otherwise(sequence(lo, hi))
      df.withColumn("_rj_bin", explode(guarded))
    }
    cover(left, lStart, lEnd)
      .join(cover(right, rStart, rEnd), keyCols :+ "_rj_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_rj_bin") === bin(greatest(col(lStart), col(rStart))))
      .drop("_rj_bin")
  }
}
