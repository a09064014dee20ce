package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, the
  * engine Spark ships): the 100 TB answer to "distinct X over any
  * slice" — build per-fine-slice sketches ONCE in the corpus pass,
  * persist the binary column, and answer every coarser rollup (any day
  * range, any source union, global) by UNIONING sketches without ever
  * rescanning rows. An exact `count(DISTINCT)` re-shuffles the raw keys
  * for every new slicing; the sketch table is built once and each
  * rollup touches only (slices) rows.
  *
  * Error contract: relative standard error ≈ 1.04/√2^lgK (≈1.6 % at
  * the default lgK=12); below the sketch's coupon-promotion threshold
  * the estimate is EXACT (the sparse mode stores hashes, not
  * registers), which is what lets gate-scale oracles compare it to
  * `count(DISTINCT)` directly — SketchesSpec pins both regimes.
  * Union is lossless at equal lgK: merge-of-parts ≡ sketch-of-whole,
  * bit-identically, regardless of how rows were partitioned.
  *
  * DELETE-INCAPABLE BY CONSTRUCTION — deliberately outside the
  * [[Tombstones]] lifecycle the persisted indexes carry: an HLL
  * register is a max over hashed offsets and a CountMin cell a sum
  * whose one-sided overcount guarantee dies under subtraction, so no
  * tombstone can be "applied" to a persisted sketch state. The
  * takedown path for sketch tables is REBUILD-FROM-SLICES: keep the
  * sketch table keyed at the finest slice you must be able to forget
  * (e.g. source × day), drop the affected slice rows, and re-sketch
  * only that slice's raw data — every coarser rollup self-heals
  * because rollups are unions over the slice rows.
  */
object Sketches {

  /** Per-group HLL sketch of distinct `valueCol`: one corpus pass,
    * map-side partial sketches merged per group — the exchange carries
    * ≤ 2^lgK-byte sketch states, never the raw keys. Output:
    * `groupCols…, sketch binary`.
    */
  def hllAgg(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "hllAgg needs >= 1 group column")
    require(lgK >= 4 && lgK <= 21, s"lgK=$lgK outside datasketches [4, 21]")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))
  }

  /** Roll a sketch table up to a coarser grouping by UNIONING sketches
    * — rows touched: the sketch table's, never the corpus. Pass
    * `Nil` to collapse to one global row (grouped by a literal).
    */
  def hllRollup(
      df: DataFrame,
      coarserGroupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    if (coarserGroupCols.isEmpty)
      df.agg(hll_union_agg(col(sketchCol)).as(sketchCol))
    else
      df.groupBy(coarserGroupCols.map(col): _*)
        .agg(hll_union_agg(col(sketchCol)).as(sketchCol))

  /** Distinct-count readout of a sketch column (long). */
  def hllEstimate(sketch: Column): Column =
    hll_sketch_estimate(sketch).cast("long")

  /** Read a persisted sketch table (e.g. one maintained by
    * [[graft.streaming.SketchStream]]) and roll its partial rows up to
    * one sketch per group — the read path that makes the table's
    * additive-rows append contract invisible to consumers.
    */
  def readSketchTable(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    hllRollup(spark.read.parquet(path), groupCols, sketchCol)

  /** Pairwise distinct-overlap matrix from a sketch table by
    * inclusion–exclusion: `|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)`,
    * one row per unordered group pair. In the sparse regime all three
    * terms are exact, so the overlap is exact (the q169 oracle's
    * load-bearing fact); in the promoted regime the error compounds to
    * ~3 RSEs, clamped at 0.
    *
    * Scale shape: runs ENTIRELY on the sketch table — the |groups|²/2
    * pair join over fixed-size sketch states is group-cardinality-
    * bound (the [[Dedup.crossSourceDupMatrix]] contract: sources, not
    * corpus, price the pairs) and never rescans rows.
    */
  def hllOverlapMatrix(
      sketches: DataFrame,
      groupCol: String,
      sketchCol: String = "sketch"): DataFrame = {
    val a = sketches.select(col(groupCol).as("_sk_ga"), col(sketchCol).as("_sk_sa"))
    val b = sketches.select(col(groupCol).as("_sk_gb"), col(sketchCol).as("_sk_sb"))
    a.join(b, col("_sk_ga") < col("_sk_gb"))
      .select(col("_sk_ga").as(s"${groupCol}_a"),
        col("_sk_gb").as(s"${groupCol}_b"),
        greatest(lit(0L),
          hllEstimate(col("_sk_sa")) + hllEstimate(col("_sk_sb"))
            - hllEstimate(hll_union(col("_sk_sa"), col("_sk_sb"))))
          .as("est_shared"))
  }

  // ---------------------------------------------------------------
  // CountMin frequency sketch (Cormode & Muthukrishnan 2005) — the
  // FREQUENCY twin of the HLL distinct table: per-group point-count
  // estimates from a fixed-size state, never a vocabulary-sized
  // relation. The sketch is kept as ROWS (group…, d, bucket, cnt),
  // ≤ depth×width cells per group: cells are ADDITIVE, so merging
  // sketches (or appending streamed partials) is a plain SUM group-by
  // — the LexIndex stats-row contract — and merge-of-parts equals
  // sketch-of-whole EXACTLY, not just within error. Estimates are
  // one-sided: est(x) ≥ true(x) always; overcount ≤ e/width · N per
  // row with prob 1 − exp(−depth) (xxhash64 row-seeded by d).
  // ---------------------------------------------------------------

  private def cmBucket(value: Column, d: Column, width: Int): Column =
    pmod(xxhash64(value, d), lit(width.toLong))

  private def cmValidate(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"cm: depth=$depth outside [1, 16]")
    require(width >= 8, s"cm: width=$width < 8")
  }

  /** Per-group CountMin sketch of `valueCol` occurrences: one corpus
    * pass; the explode-by-depth exchange map-side combines to
    * ≤ depth×width cells per group per task, so the shuffle payload is
    * sketch-sized regardless of vocabulary. Output:
    * `groupCols…, d, bucket, cnt` (sparse — zero cells absent).
    */
  def cmAgg(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      depth: Int = 4,
      width: Int = 2048): DataFrame = {
    require(groupCols.nonEmpty, "cmAgg needs >= 1 group column")
    cmValidate(depth, width)
    df.select(groupCols.map(col) :+ col(valueCol).as("_cm_v") :+
        explode(sequence(lit(0), lit(depth - 1))).as("d"): _*)
      .select(groupCols.map(col) :+ col("d") :+
        cmBucket(col("_cm_v"), col("d"), width).as("bucket"): _*)
      .groupBy(groupCols.map(col) :+ col("d") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge a CountMin table to a coarser grouping — cell-wise sums,
    * exact (merge-of-parts ≡ sketch-of-whole). Also the read path for
    * streamed additive partials. Pass `Nil` to collapse all groups.
    */
  def cmMerge(
      table: DataFrame,
      coarserGroupCols: Seq[String]): DataFrame =
    table.groupBy((coarserGroupCols ++ Seq("d", "bucket")).map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for a query relation
    * (`groupCols…, valueCol`): min over the depth rows of the matching
    * cells (absent cell = 0). One explode-by-depth of the QUERY side, a
    * (group, d, bucket)-keyed left join against the sketch table, and
    * a per-query min agg — sketch-table-scale, never a corpus rescan.
    * Output: `groupCols…, valueCol, est`.
    */
  def cmEstimate(
      table: DataFrame,
      queries: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      depth: Int = 4,
      width: Int = 2048): DataFrame = {
    cmValidate(depth, width)
    queries.select(groupCols.map(col) :+ col(valueCol): _*).distinct()
      .select(groupCols.map(col) :+ col(valueCol) :+
        explode(sequence(lit(0), lit(depth - 1))).as("d"): _*)
      .withColumn("bucket", cmBucket(col(valueCol), col("d"), width))
      .join(table, groupCols ++ Seq("d", "bucket"), "left")
      .groupBy(groupCols.map(col) :+ col(valueCol): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---------------------------------------------------------------
  // KLL quantile sketch (Karnin–Lang–Liberty 2016, DataSketches
  // KllDoublesSketch) — the QUANTILE member of the family, closing
  // the continuous-domain gap: [[Stats.exactQuantilesByGroup]] is
  // exact but histogram-based, so its state is value-cardinality-
  // bound — unbounded for classifier probabilities / LM perplexities
  // where every value is distinct. The KLL state is ~3 KB per group
  // at the default k=200 regardless of cardinality, mergeable
  // (rollup-on-read, streaming partials) like the HLL table, with
  // rank error ≤ getNormalizedRankError(k) ≈ 1.65% at 99% confidence.
  // Native aggregates live in [[graft.functions.KllSketchAgg]] /
  // [[graft.functions.KllUnionAgg]] (TypedImperativeAggregate —
  // buffers are heap sketches per task, compact bytes only on the
  // exchange).
  // ---------------------------------------------------------------

  /** Per-group KLL sketch of `valueCol` (cast to double): one corpus
    * pass, map-side partial sketches merged per group. Output:
    * `groupCols…, sketch binary`.
    */
  def kllAgg(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 200): DataFrame = {
    require(groupCols.nonEmpty, "kllAgg needs >= 1 group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.GraftFunctions
        .kllAgg(col(valueCol).cast("double"), k).as("sketch"))
  }

  /** Roll a KLL sketch table up to a coarser grouping by merging
    * states — rows touched: the sketch table's, never the corpus.
    * Pass `Nil` to collapse to one global row.
    */
  def kllRollup(
      df: DataFrame,
      coarserGroupCols: Seq[String],
      sketchCol: String = "sketch",
      k: Int = 200): DataFrame = {
    val u = graft.functions.GraftFunctions.kllUnionAgg(col(sketchCol), k)
      .as(sketchCol)
    if (coarserGroupCols.isEmpty) df.agg(u)
    else df.groupBy(coarserGroupCols.map(col): _*).agg(u)
  }

  /** Read a persisted KLL sketch table (e.g. one maintained by
    * [[graft.streaming.SketchStream.kllAppendBatch]]) and roll its
    * partial rows up to one sketch per group.
    */
  def readKllTable(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      groupCols: Seq[String],
      sketchCol: String = "sketch",
      k: Int = 200): DataFrame =
    kllRollup(spark.read.parquet(path), groupCols, sketchCol, k)

  /** Convenience readout: per-group estimated quantiles at `qs` from a
    * sketch table — `groupCols…, q_<rank>…` one double column per
    * requested rank.
    */
  def kllGroupQuantiles(
      sketches: DataFrame,
      qs: Seq[Double],
      sketchCol: String = "sketch"): DataFrame = {
    require(qs.nonEmpty, "kllGroupQuantiles: empty rank list")
    qs.foreach(q => require(q >= 0 && q <= 1, s"rank $q outside [0, 1]"))
    val arr = graft.functions.GraftFunctions.kllQuantiles(col(sketchCol), qs)
    val cols = qs.zipWithIndex.map { case (q, i) =>
      element_at(arr, i + 1).as(s"q_$q")
    }
    sketches.select(
      sketches.columns.filterNot(_ == sketchCol).map(col) ++ cols: _*)
  }

  /** The continuous-domain DATASHEET consumer of the KLL path: per
    * group, exact mass columns (`n_docs`, `total_<valueCol>`) plus
    * sketch-estimated quantile columns — the q144-style release
    * summary's distribution view without the exact histogram's
    * value-cardinality bound (on a float domain an exact histogram
    * keys one row per distinct value; the KLL state stays ~k
    * regardless). ONE corpus pass: counts, sums, and the KLL state
    * ride the same hash aggregation, so the datasheet costs exactly
    * what the plain mass rollup cost. Exact-regime contract (n ≤ k per
    * group) makes the quantiles the true order statistics — the q195
    * oracle lever; past k the 2ε rank-error gate applies
    * (SketchesSpec).
    */
  def kllDatasheet(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75),
      k: Int = 200): DataFrame = {
    require(groupCols.nonEmpty, "kllDatasheet needs >= 1 group column")
    // no cast on the total: Spark's sum already yields long for
    // integral inputs, and forcing long would silently truncate the
    // "exact mass" promise on the float domains this datasheet exists
    // for
    val sk = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(valueCol)).as(s"total_$valueCol"),
        graft.functions.GraftFunctions
          .kllAgg(col(valueCol).cast("double"), k).as("sketch"))
    kllGroupQuantiles(sk, qs)
  }

  // ---------------------------------------------------------------
  // Theta sketch (the DataSketches theta family Spark 4 ships as
  // built-ins) — the SET-ALGEBRA member: where HLL answers only
  // "how many distinct" (intersections forced through inclusion–
  // exclusion, [[hllOverlapMatrix]], whose error COMPOUNDS across
  // three estimates and can go negative), a theta sketch retains a
  // θ-sampled set of the hashes themselves, so A ∩ B and A \ B are
  // first-class operations with their own error bounds — the audit
  // questions ("how many of source A's tokens/users are NOT in B?")
  // that inclusion–exclusion answers badly. Price: ~8–16 bytes per
  // retained hash vs HLL's registers, i.e. a theta state at lgK=12 is
  // ~4–8× an HLL state — carry both tables; they answer different
  // questions. Exactness contract (the oracle's lever): below 2^lgK
  // retained hashes the sketch never samples (θ = 1) and estimate,
  // intersection and difference are all EXACT; union at equal lgK is
  // merge-order-insensitive. Delete-incapable like the rest of the
  // family (θ-sampling is not subtractive) — rebuild-from-slices.
  // ---------------------------------------------------------------

  /** Per-group theta sketch of distinct `valueCol`: one corpus pass,
    * map-side partial sketches merged per group — the exchange carries
    * sketch states bounded by 2^lgK hashes, never the raw keys.
    * Output: `groupCols…, sketch binary`.
    */
  def thetaAgg(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "thetaAgg needs >= 1 group column")
    require(lgK >= 4 && lgK <= 26, s"lgK=$lgK outside datasketches [4, 26]")
    df.groupBy(groupCols.map(col): _*)
      .agg(theta_sketch_agg(col(valueCol), lgK).as("sketch"))
  }

  /** Roll a theta sketch table up to a coarser grouping by UNIONING
    * states — rows touched: the sketch table's, never the corpus.
    * Pass `Nil` to collapse to one global row.
    */
  def thetaRollup(
      df: DataFrame,
      coarserGroupCols: Seq[String],
      sketchCol: String = "sketch",
      lgK: Int = 12): DataFrame = {
    val u = theta_union_agg(col(sketchCol), lgK).as(sketchCol)
    if (coarserGroupCols.isEmpty) df.agg(u)
    else df.groupBy(coarserGroupCols.map(col): _*).agg(u)
  }

  /** Distinct-count readout of a theta sketch column (long). */
  def thetaEstimate(sketch: Column): Column =
    theta_sketch_estimate(sketch).cast("long")

  /** Read a persisted theta sketch table (e.g. one maintained by
    * [[graft.streaming.SketchStream.thetaAppendBatch]]) and roll its
    * partial rows up to one sketch per group.
    */
  def readThetaTable(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      groupCols: Seq[String],
      sketchCol: String = "sketch",
      lgK: Int = 12): DataFrame =
    thetaRollup(spark.read.parquet(path), groupCols, sketchCol, lgK)

  /** Pairwise set-algebra matrix from a theta sketch table: per
    * unordered group pair, DIRECT `|A ∩ B|` plus the asymmetric
    * `|A \ B|` / `|B \ A|` — single-estimate error each (exact in the
    * θ = 1 regime), never inclusion–exclusion. Same scale shape as
    * [[hllOverlapMatrix]]: |groups|²/2 pairs over fixed-size states,
    * group-cardinality-bound, zero corpus rescans.
    */
  def thetaOverlapMatrix(
      sketches: DataFrame,
      groupCol: String,
      sketchCol: String = "sketch"): DataFrame = {
    val a = sketches.select(col(groupCol).as("_th_ga"), col(sketchCol).as("_th_sa"))
    val b = sketches.select(col(groupCol).as("_th_gb"), col(sketchCol).as("_th_sb"))
    a.join(b, col("_th_ga") < col("_th_gb"))
      .select(col("_th_ga").as(s"${groupCol}_a"),
        col("_th_gb").as(s"${groupCol}_b"),
        thetaEstimate(theta_intersection(col("_th_sa"), col("_th_sb")))
          .as("est_shared"),
        thetaEstimate(theta_difference(col("_th_sa"), col("_th_sb")))
          .as("est_only_a"),
        thetaEstimate(theta_difference(col("_th_sb"), col("_th_sa")))
          .as("est_only_b"))
  }
}
