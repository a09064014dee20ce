package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / data-mixing operators.
  *
  * A training-data pipeline rarely takes a corpus whole: sources are
  * capped ("at most N documents per (lang, domain)"), up- or
  * down-weighted, and the caps must be DETERMINISTIC so reruns build
  * the same mixture.
  */
object Sampling {

  /** Deterministic per-group quota cap: keep the `k` smallest-`orderCol`
    * rows of every `groupCols` group (order by a hash-derived column for
    * an unbiased draw; by quality score for a best-of cap).
    *
    * Scale shape: a rank-filter window, which Spark 3.5+ plans with
    * WindowGroupLimit — every map task pre-prunes its partition to k
    * rows per group BEFORE the exchange, so the shuffle carries at most
    * k·numPartitions rows per group no matter how hot the group. The
    * skew protection is structural (no salting needed); PlanSpec pins
    * the WindowGroupLimit node so a regression in plan shape fails the
    * suite, not the cluster.
    */
  def quotaPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
    // collision-safe internal name: a caller's own column of the same
    // base name survives (withColumn would silently REPLACE it and the
    // drop would then delete caller data)
    val rk = Dedup.freshName(df, "_graft_rk")
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= k)
      .drop(rk)
  }

  /** Deterministic STRATIFIED train/test split: within every stratum,
    * rows are ranked by `orderCol` and every `testEvery`-th row goes to
    * the test split — exact per-stratum fractions (⌊n/testEvery⌋ test
    * rows per stratum, never the binomial jitter of a random draw), so
    * a rare language cannot end up with an empty or doubled test set.
    *
    * Adds a `split` column ("train"/"test"); rejects inputs that
    * already have one (silently replacing caller data is never this
    * library's call).
    *
    * Scale/trade-off: the rank needs a per-stratum sort-shuffle (no
    * WindowGroupLimit — every row keeps its rank). When exact fractions
    * don't matter, [[hashSample]] is the map-only, shuffle-free path;
    * this operator is the one you reach for when they do. Deterministic
    * for a fixed (corpus, orderCol): reruns produce the identical
    * split, and membership is stable under input repartitioning.
    */
  def stratifiedSplit(
      df: DataFrame,
      strataCols: Seq[String],
      orderCol: String,
      testEvery: Int): DataFrame = {
    require(testEvery >= 2, s"testEvery $testEvery must be >= 2 (1 would put everything in test)")
    require(!df.columns.exists(_.equalsIgnoreCase("split")), // resolver is case-insensitive
      "stratifiedSplit emits a `split` column; input already has one — rename it first")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(col(orderCol))
    val rk = Dedup.freshName(df, "_graft_rk")
    df.withColumn(rk, row_number().over(w))
      .withColumn("split",
        when(pmod(col(rk), lit(testEvery)) === 0, lit("test")).otherwise(lit("train")))
      .drop(rk)
  }

  /** Mixture up-weighting: repeat each row `ceil(weight)`-ish times —
    * the "epochs per source" half of data mixing (quotaPerGroup is the
    * down-cap half). Integer part: every row emits copies 1..floor(w).
    * Fractional part: one extra copy for the deterministic
    * `hashSample`-style fraction of rows ([[hashSample]]'s predicate on
    * (key, floor(w)+1) as the copy id), so a weight of 2.25 yields
    * exactly 2 copies for ~75 % of rows and 3 for ~25 %, reproducibly.
    * Map-only: an explode of a generated sequence, no shuffle, no
    * driver participation — weights can be a per-row column (joined
    * from a mixture config) or a literal expression.
    */
  def repeatByWeight(
      df: DataFrame,
      weight: org.apache.spark.sql.Column,
      keyCol: String,
      seed: Long = 42L): DataFrame = {
    // `copy` is the operator's OUTPUT contract (callers key epochs off
    // it), so it cannot be silently renamed — reject inputs that would
    // have their own `copy` column replaced instead.
    require(!df.columns.exists(_.equalsIgnoreCase("copy")), // resolver is case-insensitive
      "repeatByWeight emits a `copy` column; input already has one — rename it first")
    val wFloor = floor(weight).cast("long")
    val frac = weight.cast("double") - wFloor.cast("double")
    val bound = (frac * lit((1L << 62).toDouble * 2.0)).cast("long")
    val extra = when(
      shiftrightunsigned(xxhash64(col(keyCol), lit(seed)), 1) < bound, 1L).otherwise(0L)
    val n = wFloor + extra
    // weights under 1 are a downsample: rows drawing 0 copies vanish
    // (sequence(1, 0) counts DOWN in Spark — guard it)
    df.withColumn("copy",
      explode(when(n >= 1, sequence(lit(1L), n))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Deterministic pseudo-random fraction sample: keep rows whose seeded
    * key hash lands under `fraction` of the hash space. Unlike
    * `df.sample`, the draw is a pure row-local predicate — stable across
    * partitioning, resumable, and joinable (two tables sampled on the
    * same key keep the SAME keys, so samples stay referentially intact).
    *
    * The hash maps into [0, 2^63) via an unsigned shift — NOT abs(),
    * whose Long.MinValue fixed point is negative and would leak that
    * key into every sample including fraction 0. The endpoints are
    * exact: 0.0 keeps nothing, 1.0 keeps everything.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    if (fraction >= 1.0) df
    else {
      val bound = (fraction * (1L << 62).toDouble * 2.0).toLong
      df.filter(shiftrightunsigned(xxhash64(col(keyCol), lit(seed)), 1) < lit(bound))
    }
  }

  /** Globally contiguous 0-based index in `keyCol` order — the
    * distributed `zipWithIndex`: `row_number() OVER (ORDER BY key)`
    * semantics WITHOUT the single-partition global-sort window that
    * formulation plans (one reducer holding the whole table is the
    * canonical driver-shaped bottleneck at 100 TB).
    *
    * Two-phase: range-partition on the key (each of `nShards` tasks
    * sorts only its slice), rank locally, then add the prefix-sum of
    * shard counts — an `nShards`-row aggregate that broadcasts. The
    * result is invariant to where the sampled range boundaries fall,
    * so the relation is deterministic even though the boundaries are
    * estimated.
    *
    * Determinism assumption: the ranked side and the offsets side both
    * re-evaluate `local`, so the pid-keyed join relies on the two
    * subtrees landing on the SAME range boundaries — true for
    * deterministic inputs (files, any pure transform chain), which is
    * exchange-reuse independent because RangePartitioner re-samples the
    * same rows. A NON-deterministic upstream (round-robin
    * `repartition()`, a re-executed random source) can break that under
    * task retries; materialize such inputs first.
    *
    * `keyCol` must be duplicate-free (the usual unique-id contract —
    * ties would make ranks within a key arbitrary). Appends
    * `global_idx`; everything else passes through.
    */
  def contiguousIndex(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    require(!df.columns.exists(_.equalsIgnoreCase("global_idx")),
      "contiguousIndex writes a 'global_idx' column but the input already has one")
    val pid = Dedup.freshName(df, "_graft_pid")
    val rk = Dedup.freshName(df, "_graft_lrk")
    val off = Dedup.freshName(df, "_graft_off")
    val local = df.repartitionByRange(nShards, col(keyCol))
      .withColumn(pid, spark_partition_id())
      // partitionBy(pid) re-exchanges on hash(pid) — Catalyst can't see
      // it equals the existing distribution. The price is one extra
      // parallel shuffle; the win is no 1-partition global window.
      .withColumn(rk, row_number().over(
        Window.partitionBy(col(pid)).orderBy(col(keyCol))).cast("long"))
    // nShards rows: the single-partition window here is over the
    // per-shard COUNTS, not the data.
    val offsets = local.groupBy(col(pid)).agg(count(lit(1)).as("n"))
      .withColumn(off, coalesce(
        sum("n").over(Window.orderBy(col(pid))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("n")
    local.join(broadcast(offsets), pid)
      .withColumn("global_idx", col(rk) + col(off) - 1)
      .drop(pid, rk, off)
  }

  /** Exclusive prefix sum of `weightCol` in `keyCol` order — the
    * weighted generalization of [[contiguousIndex]] (same two-phase
    * range-partition shape, same determinism contract, `keyCol`
    * duplicate-free): appends `cum_sum` = Σ weight over all rows with
    * strictly smaller keys. The scalable building block for rank-sum
    * statistics (mid-rank AUC, Gini-style functionals) that a
    * `sum() OVER (ORDER BY key)` global window would serialize onto
    * one reducer.
    */
  def prefixSum(df: DataFrame, keyCol: String, weightCol: String,
      nShards: Int = 32): DataFrame =
    prefixSumBy(df, Nil, keyCol, weightCol, nShards)

  /** Per-group [[prefixSum]]: `cum_sum` = Σ weight over rows of the
    * SAME `groupCols` values with strictly smaller keys. Range
    * partitioning on (group, key) lets one large group span MANY
    * shards — the per-(pid, group) offsets relation (≤ shards ×
    * groups rows) re-serializes only a groups-keyed window over shard
    * counts, never the data. A `Window.partitionBy(group)` would cap
    * parallelism at the group count (q149's first cut measured 9.8×
    * at the 64× probe on 20 sources; this shape landed 5.1×, with the
    * sub-second absolutes dominated by its fixed extra exchanges —
    * the trade that matters at a billion distinct scores per group).
    */
  def prefixSumBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
      weightCol: String, nShards: Int = 32): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    require(!df.columns.exists(_.equalsIgnoreCase("cum_sum")),
      "prefixSum writes a 'cum_sum' column but the input already has one")
    val pid = Dedup.freshName(df, "_graft_pid")
    val loc = Dedup.freshName(df, "_graft_lcs")
    val off = Dedup.freshName(df, "_graft_off")
    val gcols = groupCols.map(col)
    val rangeCols = gcols :+ col(keyCol)
    val local = df.repartitionByRange(nShards, rangeCols: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn(loc, sum(col(weightCol)).over(
        Window.partitionBy((col(pid) +: gcols): _*).orderBy(col(keyCol))
          .rowsBetween(Window.unboundedPreceding, -1)))
    val offsets = local.groupBy((col(pid) +: gcols): _*)
      .agg(sum(col(weightCol)).as("n"))
      .withColumn(off, coalesce(
        sum("n").over(Window.partitionBy(gcols: _*).orderBy(col(pid))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("n")
    local.join(broadcast(offsets), pid +: groupCols)
      .withColumn("cum_sum", coalesce(col(loc), lit(0L)) + col(off))
      .drop(pid, loc, off)
  }

  /** Weighted sampling WITHOUT replacement, `k` rows per group
    * (Efraimidis–Spirakis A-ES): each row draws a deterministic
    * pseudo-uniform u from the seeded [[seededMix]] of its key and
    * ranks by ln(u)/w — the k best per group are distributed exactly as
    * sequential weighted draws without replacement. The quality-vs-
    * quota knob a mixture needs between [[quotaPerGroup]] (hard cap,
    * deterministic order) and [[hashSample]] (unweighted fraction):
    * doubling a row's weight doubles its first-draw odds, but no
    * weight, however large, can take more than its one slot.
    *
    * ln is monotone, so ranking by ln(u)/w ≡ ranking by the textbook
    * u^(1/w) — without the pow() whose cross-engine ULP drift would be
    * larger; u = (mix + 0.5)/2³² is exact in double (the scale is a
    * power of two), making the whole rank key reproducible by the SQL
    * oracle bit-for-bit modulo a 1-ulp ln difference, far below the
    * ~2⁻³² spacing of distinct u's. Ties (keys equal mod 2³¹) break by
    * the key.
    *
    * Rows with weight ≤ 0 are excluded (a zero-weight row can never be
    * drawn; negative weights have no sampling meaning).
    *
    * Scale shape: the rank is a rank-filter window → WindowGroupLimit
    * pre-prunes every map task to k rows per group BEFORE the exchange
    * (same structural skew protection as [[quotaPerGroup]] — a hot
    * group ships k·partitions rows, never its population).
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weight: org.apache.spark.sql.Column,
      groupCols: Seq[String],
      k: Int,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val u = (seededMix(col(keyCol).cast("long"), seed).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val esKey = log(u) / weight
    val rk = Dedup.freshName(df, "_graft_rk")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(esKey.desc, col(keyCol))
    df.filter(weight > lit(0.0))
      .withColumn(rk, row_number().over(w))
      .filter(col(rk) <= k)
      .drop(rk)
  }

  /** Exact-quantile bucket id for `valueCol`: cut points are the exact
    * interpolated percentiles at `probs` (an all-column aggregate that
    * broadcasts as one row), bucket = how many cut points the value is
    * ≥ — so `probs = [0.25, 0.5, 0.75]` yields quartile ids 0–3. The
    * corpus-partitioning step of perplexity-filtered mixtures
    * (buckets → per-bucket caps/weights).
    *
    * Deliberately NOT `ntile()`: a global ntile windows over ONE
    * partition — the whole corpus sorted by a single task. Here the
    * only non-map stage is the percentile aggregate (map-side partial,
    * one reduce of per-partition digests); bucketing itself is a
    * broadcast-compare, and ties land deterministically (every value
    * equal to a cut point goes to the same side, in every engine
    * computing the same comparison).
    */
  def quantileBucket(df: DataFrame, valueCol: String, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p < 1.0),
      s"probs ${probs.mkString(",")} must all be in (0, 1)")
    require(probs == probs.sorted && probs.distinct == probs,
      s"probs ${probs.mkString(",")} must be strictly increasing")
    require(!df.columns.exists(_.equalsIgnoreCase("bucket")),
      "quantileBucket writes a 'bucket' column but the input already has one")
    val cutsCol = Dedup.freshName(df, "_graft_cuts")
    val cuts = df.agg(
      expr(s"percentile($valueCol, array(${probs.mkString(",")}))").as(cutsCol))
    df.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        size(filter(col(cutsCol), c => col(valueCol) >= c)))
      .drop(cutsCol)
  }

  /** Deterministic training-order shuffle + sharding: every row gets a
    * pseudo-random but SEEDED rank (Knuth multiplicative hash of its
    * key), a shard id, and its position within the shard — the
    * "shuffle once, replay anywhere" contract a training run needs for
    * resumable, order-reproducible epochs. Plain integer arithmetic
    * (not xxhash) so any engine reading the manifest can recompute the
    * order; each step stays under 2⁶³ by reducing the key mod 2³¹
    * first (keys that collide there are tie-broken by the key itself,
    * keeping the total order deterministic).
    *
    * Scale shape: shard, rank AND the slice a row ranks in are all
    * row-local expressions. Because `mix` is uniform in [0, 2³²) BY
    * CONSTRUCTION (a multiplicative hash), the total (shard, mix, key)
    * order can be cut into contiguous slices analytically —
    * `bucket = shard·S + (mix·S) >> 32` — with no range-boundary
    * sampling job at all (the round-5 shape range-partitioned, which
    * pays a sampling pass over the input and, because Catalyst prunes
    * the two subtrees differently, re-ran that exchange twice; the
    * analytic bucket needs neither). Each bucket ranks in an ordinary
    * hash-partitioned window — ~S·nShards groups, so a shard is spread
    * over MANY tasks, never the classic under-parallelized
    * `partitionBy(shard)` window that would sort 1/nShards of the
    * corpus in one task — and the bucket-count prefix sum joins back
    * as a broadcast of ≤ S·nShards rows. The offsets branch
    * partial-aggregates map-side, so the input is scanned twice but
    * SHUFFLED only once (the second pass exchanges ≤ S·nShards count
    * rows, not data). Fully deterministic under any physical
    * partitioning — no `spark_partition_id`, no sampled boundaries.
    * Keys must be non-negative (ids); `pos` is dense from 1 within
    * each shard.
    */
  /** Temperature-scaled source mixture sampling — the multilingual /
    * UNIMAX mixing rule: source `i` holding `t_i` tokens gets budget
    * share `p_i = t_i^τ / Σ_j t_j^τ`, so τ = 1 reproduces natural
    * proportions and τ → 0 flattens toward uniform (up-sampling the
    * tail sources); each source is then materialized at fraction
    * `min(1, budget·p_i / t_i)` of its documents via the [[seededMix]]
    * integer LCG, so the SAME documents are selected on every rerun
    * and by any engine recomputing the rule (the manifest contract).
    *
    * The fraction is rounded to 6 before the cut and the cut compares
    * the 32-bit mix against `fraction · 2³²` — both sides exact
    * IEEE-double ops on engine-identical inputs, so the selected set
    * is reproducible cross-engine (`pow`/division agree to an ulp,
    * nowhere near the 1e-6 grid).
    *
    * Scale shape: one token-count agg to a source-bound table, one
    * scalar normalizer, one broadcast fraction join back, one map-only
    * filter — the corpus is scanned twice (count + cut) and shuffled
    * only by the source-keyed agg's partial rows. Output keeps
    * `(id, source, n_tok, fraction)`; join survivors back to the text
    * by id when the cut feeds a writer.
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      nTokens: org.apache.spark.sql.Column,
      temperature: Double,
      budgetTokens: Long,
      seed: Long = 42L): DataFrame = {
    require(temperature > 0, s"temperature=$temperature must be > 0")
    require(budgetTokens >= 1, s"budgetTokens=$budgetTokens must be >= 1")
    val base = df.select(col(idCol), col(sourceCol), nTokens.cast("long").as("n_tok"))
    val per = base.groupBy(sourceCol)
      .agg(sum("n_tok").cast("double").as("t"))
    val z = per.agg(sum(pow(col("t"), lit(temperature))).as("z"))
    val frac = per.crossJoin(broadcast(z))
      .select(col(sourceCol),
        round(least(lit(1.0),
          lit(budgetTokens.toDouble) * pow(col("t"), lit(temperature))
            / col("z") / col("t")), 6).as("fraction"))
    base.join(broadcast(frac), Seq(sourceCol))
      .filter(seededMix(col(idCol), seed).cast("double") <
        col("fraction") * lit(4294967296.0))
      .select(col(idCol), col(sourceCol), col("n_tok"), col("fraction"))
  }

  /** The seeded Knuth multiplicative mix shared by [[seededShuffle]],
    * [[weightedSample]], [[temperatureSample]] and their SQL oracles:
    * pseudo-uniform in [0, 2³²), pure integer arithmetic so ANY engine
    * reading a manifest can recompute it bit-identically. Keys that
    * collide mod 2³¹ are tie-broken by the key itself wherever the mix
    * orders rows.
    */
  def seededMix(key: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    pmod(
      pmod(key, lit(2147483648L)) * lit(2654435761L) + lit(seed),
      lit(4294967296L))

  def seededShuffle(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      seed: Long = 42L,
      slicesPerShard: Int = 32): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    require(slicesPerShard >= 1 && slicesPerShard <= (1 << 20),
      s"slicesPerShard=$slicesPerShard must be in [1, 2^20]")
    Seq("shard", "pos").foreach { n =>
      require(!df.columns.exists(_.equalsIgnoreCase(n)),
        s"seededShuffle writes a '$n' column but the input already has one")
    }
    val k = col(keyCol).cast("long")
    val mixExpr = seededMix(k, seed)
    val mix = Dedup.freshName(df, "_graft_mix")
    val bkt = Dedup.freshName(df, "_graft_bkt")
    val rk = Dedup.freshName(df, "_graft_lrk")
    val off = Dedup.freshName(df, "_graft_off")
    val s = slicesPerShard.toLong
    // (mix·S) >> 32 is exact integer floor(mix·S / 2³²): mix < 2³² and
    // S ≤ 2²⁰ keep the product under 2⁵², and the shift never rounds
    // (a double division could bump a boundary row into the next slice).
    val base = df
      .withColumn("shard", pmod(mixExpr, lit(nShards.toLong)))
      .withColumn(mix, mixExpr)
      .withColumn(bkt,
        col("shard") * lit(s) + shiftrightunsigned(col(mix) * lit(s), 32))
    val local = base.withColumn(rk, row_number().over(
      Window.partitionBy(col(bkt)).orderBy(col(mix), k)).cast("long"))
    // ≤ S·nShards rows (one per slice); partial aggregation makes this
    // branch's exchange carry counts, not data.
    val offsets = base.groupBy(col("shard"), col(bkt)).agg(count(lit(1)).as("n"))
      .withColumn(off, coalesce(
        sum("n").over(Window.partitionBy(col("shard")).orderBy(col(bkt))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(bkt), col(off))
    local.join(broadcast(offsets), Seq(bkt))
      .withColumn("pos", col(rk) + col(off))
      .select((df.columns.map(col) :+ col("shard") :+ col("pos")): _*)
  }

  /** Per-bucket seeded shuffle — the curriculum-ordering primitive:
    * `pos` = 1-based position of the row within its `bucketCol` group
    * under the seeded pseudo-random order (mix, key), so the global
    * training order `(bucket, pos)` visits buckets in difficulty order
    * with each bucket internally shuffled, deterministically and
    * engine-replayably (the [[seededMix]] contract).
    *
    * Scale shape: [[seededShuffle]]'s two-phase slice trick with the
    * shard replaced by the CALLER's bucket — each (bucket, slice)
    * window ranks ~n/(buckets·S) rows, the offsets relation is
    * ≤ buckets·S count rows, and no window ever sees a whole bucket
    * (a `Window.partitionBy(bucket)` would cap parallelism at the
    * bucket count — the q149 lesson).
    */
  def curriculumShuffle(
      df: DataFrame,
      keyCol: String,
      bucketCol: String,
      seed: Long = 42L,
      slicesPerBucket: Int = 32): DataFrame = {
    require(slicesPerBucket >= 1 && slicesPerBucket <= (1 << 20),
      s"slicesPerBucket=$slicesPerBucket must be in [1, 2^20]")
    require(!df.columns.exists(_.equalsIgnoreCase("pos")),
      "curriculumShuffle writes a 'pos' column but the input already has one")
    val k = col(keyCol).cast("long")
    val mixExpr = seededMix(k, seed)
    val mix = Dedup.freshName(df, "_graft_mix")
    val slc = Dedup.freshName(df, "_graft_slc")
    val rk = Dedup.freshName(df, "_graft_lrk")
    val off = Dedup.freshName(df, "_graft_off")
    val s = slicesPerBucket.toLong
    val base = df
      .withColumn(mix, mixExpr)
      .withColumn(slc, shiftrightunsigned(col(mix) * lit(s), 32))
    val local = base.withColumn(rk, row_number().over(
      Window.partitionBy(col(bucketCol), col(slc)).orderBy(col(mix), k))
      .cast("long"))
    val offsets = base.groupBy(col(bucketCol), col(slc))
      .agg(count(lit(1)).as("n"))
      .withColumn(off, coalesce(
        sum("n").over(Window.partitionBy(col(bucketCol)).orderBy(col(slc))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("n")
    local.join(broadcast(offsets), Seq(bucketCol, slc))
      .withColumn("pos", col(rk) + col(off))
      .select((df.columns.map(col) :+ col("pos")): _*)
  }

  /** Leakage-safe train/val/test split: every row whose `groupCol`
    * matches (near-dup cluster key, URL domain, lead-n-token prefix —
    * whatever names "the same content") lands in the SAME split, so an
    * eval split can never be contaminated by a training-set twin. The
    * split is decided by the [[seededMix]] of the group's canonical
    * representative (its minimum `idCol`) against cumulative percent
    * `cuts` — pure integer arithmetic, so any engine reading the
    * manifest can recompute the assignment bit-identically; re-running
    * with more data moves a group between splits only if its
    * representative changed.
    *
    * Scale shape: the corpus collapses once to the (group-hash, rep)
    * relation (group-cardinality-bound, map-side combined min), joins
    * back on the 8-byte group hash, and the assignment is a map-only
    * projection. Group strings never shuffle — only their xxhash64. A
    * 64-bit collision MERGES two groups into one split decision, which
    * is leakage-CONSERVATIVE (co-assignment can only over-group, never
    * let twins straddle splits); the oracle joins by string, so the
    * gate would surface a collision as a fraction skew.
    */
  def groupSplit(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      cuts: Seq[(String, Int)] = Seq(("train", 96), ("val", 98), ("test", 100)),
      seed: Long = 42L): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100 &&
      cuts.map(_._2).sliding(2).forall(w => w.size < 2 || w(0) < w(1)) &&
      cuts.head._2 >= 1,
      s"cuts must be ascending percents ending at 100, got $cuts")
    require(cuts.map(_._1).distinct.size == cuts.size,
      s"duplicate split names in $cuts")
    require(!df.columns.exists(_.equalsIgnoreCase("split")),
      "groupSplit writes a 'split' column but the input already has one")
    val gh = Dedup.freshName(df, "_gs_gh")
    val rep = Dedup.freshName(df, "_gs_rep")
    val keyed = df.withColumn(gh, xxhash64(col(groupCol)))
    val reps = keyed.groupBy(col(gh)).agg(min(col(idCol)).as(rep))
    val m = pmod(seededMix(col(rep), seed), lit(100L))
    val split = cuts.tail.foldLeft(when(m < cuts.head._2, cuts.head._1)) {
      case (acc, (name, hi)) => acc.when(m < hi, name)
    }
    keyed.join(reps, gh)
      .withColumn("split", split)
      .drop(gh, rep)
  }
}
